package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** dHash: codec-noise robustness, brightness invariance, and agreement
  * with the arithmetic hash the q197 oracle re-derives in SQL.
  */
class ImageHashSpec extends AnyFunSuite {

  private def plantedCells(seed: Int, jitter: Int): Array[Int] =
    Array.tabulate(ImageHash.GridW * ImageHash.GridH) { i =>
      ImageHash.plantedValue(seed, i % ImageHash.GridW,
        i / ImageHash.GridW) + jitter
    }

  private def arithmeticHash(seed: Int): Long = {
    var h = 0L
    for (y <- 0 until ImageHash.GridH; x <- 0 until ImageHash.GridW - 1) {
      if (ImageHash.plantedValue(seed, x + 1, y) >=
          ImageHash.plantedValue(seed, x, y) + ImageHash.Threshold)
        h |= 1L << (y * (ImageHash.GridW - 1) + x)
    }
    h
  }

  test("decoded JPEG hash equals the arithmetic hash for every seed") {
    (0 until 64).foreach { seed =>
      val bytes = ImageHash.grayCellJpeg(plantedCells(seed, 0))
      assert(ImageHash.dHash64(bytes).contains(arithmeticHash(seed)),
        s"seed $seed: codec noise crossed the threshold margin")
    }
  }

  test("hash is exactly invariant to uniform brightness jitter") {
    (0 until 16).foreach { seed =>
      val base = ImageHash.dHash64(ImageHash.grayCellJpeg(plantedCells(seed, 0)))
      Seq(8, 16, 24).foreach { j =>
        val jittered =
          ImageHash.dHash64(ImageHash.grayCellJpeg(plantedCells(seed, j)))
        assert(jittered == base, s"seed $seed jitter $j changed the hash")
      }
    }
  }

  test("different patterns produce different hashes (no degenerate collapse)") {
    val hashes = (0 until 64).map(s =>
      ImageHash.dHash64(ImageHash.grayCellJpeg(plantedCells(s, 0))).get)
    assert(hashes.distinct.size > 56, s"only ${hashes.distinct.size} distinct")
  }

  test("undecodable bytes are None, not a crash or a zero hash") {
    assert(ImageHash.dHash64(Array[Byte](1, 2, 3)).isEmpty)
  }
}

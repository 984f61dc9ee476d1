package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.ops.Mp4
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Video-container metadata extraction — the multimodal VIDEO leg.
  *
  * The container has no media files, so the query PLANTS deterministic
  * values derived from `doc_id`, serializes them through [[Mp4.write]] into
  * real ISO BMFF bytes, and reads them back with the independent
  * [[Mp4.parse]] box walker (brand from ftyp, duration from mvhd,
  * dimensions from tkhd, frame count from stts). The DuckDB oracle
  * re-derives the planted values arithmetically — so a green row proves the
  * full binary encode → container-parse round trip, the same proof shape as
  * q35's payload plumbing but with a REAL parser on a REAL container layout
  * (Mp4Spec additionally covers hand-built and poisoned boxes).
  *
  * Scale shape: map-only over one scan — no shuffle, no driver state;
  * header-only parsing is O(boxes), not O(payload), so at 100 TB the cost
  * is the scan itself.
  */
object MediaQ {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("brand", StringType),
    StructField("duration_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("byte_len", LongType)))

  def videoMeta(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val in = t.documents.select("doc_id")
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val brand = Seq("isom", "mp42", "avc1")((id % 3).toInt)
        val durMs = 1000L + id % 9000 // timescale 1000 ⇒ ticks == ms, exact
        val w = 320 + (id % 8).toInt * 80
        val h = 240 + (id % 6).toInt * 60
        val nf = 24 + (id % 240).toInt
        val payload = (100 + id % 50).toInt
        val bytes = Mp4.write(brand, timescale = 1000, durationTicks = durMs,
          width = w, height = h, nSamples = nf, payloadLen = payload)
        val m = Mp4.parse(bytes).getOrElse(
          sys.error(s"round-trip parse failed for doc $id")) // loud: writer/parser drift is a bug
        Row(id, m.brand, m.durationMs, m.videoWidth, m.videoHeight,
          math.min(m.nSamples, Int.MaxValue.toLong).toInt, bytes.length.toLong)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** byte_len = Mp4.fixedOverhead (361, pinned by Mp4Spec) + mdat payload. */
  private val videoMetaSql =
    s"""SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
      |    ELSE 'avc1' END AS brand,
      |  CAST(1000 + doc_id % 9000 AS BIGINT) AS duration_ms,
      |  CAST(320 + (doc_id % 8) * 80 AS INT) AS width,
      |  CAST(240 + (doc_id % 6) * 60 AS INT) AS height,
      |  CAST(24 + doc_id % 240 AS INT) AS n_frames,
      |  CAST(${Mp4.fixedOverhead} + 100 + doc_id % 50 AS BIGINT) AS byte_len
      |FROM documents""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q84_video_meta", videoMeta, Some(videoMetaSql)),
  )
}

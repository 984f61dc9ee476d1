package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkTestBase {
  import spark.implicits._

  test("native rolling hash equals a code-point reference fold, incl. unicode") {
    val docs = Seq("a", "abc", "hello world", "naïve café ☕", "数据 engine")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
    val native = docs.select($"id", GraftFunctions.rolling_hash($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference implementation in plain Scala over code points
    def ref(s: String): Long = {
      var acc = -1L
      val it = s.codePoints().iterator()
      while (it.hasNext) {
        val c = it.nextInt().toLong
        acc = if (acc < 0) c else (acc * 31 + c) % 1000000007L
      }
      acc
    }
    docs.collect().foreach { r =>
      assert(native(r.getLong(0)) == ref(r.getString(1)), s"doc ${r.getLong(0)}")
    }
  }

  test("empty string hashes to null; sql registration works") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT rolling_hash('') AS a, rolling_hash('a') AS b").head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 'a'.toLong)
  }
}

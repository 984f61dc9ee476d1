package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("as-of join matches brute-force point-in-time lookup") {
    val probes = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (1L, 50L, "p0"),
      (2L, 500L, "p3"), (3L, 10L, "p4"))
      .toDF("k", "t", "probe_id")
    val state = Seq((1L, 100L, "s-a"), (1L, 150L, "s-b"), (2L, 400L, "s-c"),
      (2L, 600L, "s-d"))
      .toDF("k", "st", "state_val")

    val out = AsOf.join(probes, state, "k", "t", "st", Seq("state_val"))
      .collect().map(r => r.getAs[String]("probe_id") -> r.getAs[String]("asof_state_val"))
      .toMap

    assert(out("p1") == "s-a", ">= semantics: state at t=100 visible to probe at t=100")
    assert(out("p2") == "s-b", "latest preceding state wins")
    assert(out("p0") == null, "no preceding state → null (left semantics)")
    assert(out("p3") == "s-c", "future state (600) must not leak backwards")
    assert(out("p4") == null, "key with no state rows")
  }

  test("as-of join equals a window-free nested-loop reference on random data") {
    val rnd = new scala.util.Random(7)
    val probes = (1 to 300).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "probe_id")
    val state = (1 to 200).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, st)
      .toDF("k", "st", "sid")

    val fast = AsOf.join(probes, state, "k", "t", "st", Seq("sid"))
      .collect().map(r => r.getAs[Long]("probe_id") -> Option(r.get(r.fieldIndex("asof_sid"))))
      .toMap
    // brute force: left join all preceding states, keep max (st, sid)
    val brute = probes.as("p").join(state.as("s"),
        $"p.k" === $"s.k" && $"p.t" >= $"s.st", "left")
      .groupBy($"p.probe_id")
      .agg(max(struct($"s.st", $"s.sid")).as("m"))
      .collect().map(r => r.getAs[Long]("probe_id") ->
        Option(r.getAs[org.apache.spark.sql.Row]("m"))
          .flatMap(m => Option(m.get(1)).map(_.asInstanceOf[Long])))
      .toMap
    assert(fast.size == brute.size)
    brute.foreach { case (pid, expected) =>
      assert(fast(pid).map(_.asInstanceOf[Long]) == expected, s"probe $pid")
    }
  }

  test("sketch aggregates carry exact values and in-bound estimate flags") {
    val q = graft.queries.AsOfQ.sketchAggregates(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"),
        expr("percentile(l_extendedprice, 0.5)").as("med"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(q.keySet == exact.keySet)
    exact.foreach { case (flag, e) =>
      assert(q(flag).getAs[Long]("exact_orders") == e.getAs[Long]("n"), s"$flag orders")
      assert(q(flag).getAs[Double]("exact_median_price") == e.getAs[Double]("med"), s"$flag median")
      Seq("orders_est_ok", "parts_est_ok", "median_est_ok", "p90_est_ok").foreach { c =>
        assert(q(flag).getAs[Boolean](c), s"$flag sketch estimate out of bounds: $c")
      }
    }
  }
}

package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The Misra-Gries guarantees, exercised in the regime the corpus's
  * 31-token vocabulary cannot exhibit (q78's oracle runs the sketch in
  * its exact regime): capacity ≪ distinct count, so decrements and
  * trimming merges actually fire, across forced multi-partition
  * aggregation where estimates are merge-order dependent — only the
  * error envelope and the inclusion guarantee are asserted, because only
  * they are deterministic.
  */
class MisraGriesSpec extends SparkSpecBase {
  import spark.implicits._

  test("reduce: decrement path fires at capacity, zeros dropped") {
    val mg = new MisraGriesAggregator(2)
    var b = mg.zero
    Seq("a", "a", "b").foreach(t => b = mg.reduce(b, t))
    assert(b.counters === Map("a" -> 2L, "b" -> 1L))
    // "c" arrives with the buffer full: every counter decrements, the
    // arrival cancels against its own decrement, zeros vanish
    b = mg.reduce(b, "c")
    assert(b.counters === Map("a" -> 1L))
    assert(b.processed === 4L)
  }

  test("merge: trims to capacity by subtracting the (capacity+1)-th count") {
    val mg = new MisraGriesAggregator(2)
    val a = MGBuf(Map("x" -> 10L, "y" -> 3L), 13L)
    val b = MGBuf(Map("y" -> 4L, "z" -> 2L), 6L)
    val m = mg.merge(a, b)
    // summed: x=10, y=7, z=2 → threshold = 3rd largest = 2 → x=8, y=5
    assert(m.counters === Map("x" -> 8L, "y" -> 5L))
    assert(m.processed === 19L)
  }

  test("adversarial stream: inclusion + error envelope hold under forced multi-partition merges") {
    val capacity = 8
    // 3 heavy tokens (1200/900/600) buried in 3000 singletons:
    // distinct = 3003 >> capacity, N = 5700,
    // N/(capacity+1) = 633 → h1/h2 MUST survive (freq > 633); h3 at 600
    // is below the guarantee line and gets no inclusion promise
    val heavies = Seq.fill(1200)("h1") ++ Seq.fill(900)("h2") ++ Seq.fill(600)("h3")
    val noise = (0 until 3000).map(i => s"n$i")
    val stream = new scala.util.Random(11).shuffle((heavies ++ noise).toList)
    val n = stream.size.toLong
    val rows = stream.toDF("tok").repartition(7).as[String]
      .select(new MisraGriesAggregator(capacity).toColumn)
      .toDF("counters", "total") // case-class output flattens to 2 cols
      .select(explode(col("counters")).as(Seq("tok", "est")), col("total"))
      .collect()
    val sketch = rows.map(r => r.getAs[String]("tok") -> r.getAs[Long]("est")).toMap
    assert(sketch.size <= capacity)
    // the bound's N rides out of the sketch itself
    assert(rows.forall(_.getAs[Long]("total") === n))
    // inclusion guarantee: freq > N/(capacity+1)
    assert(sketch.contains("h1"), sketch.toString)
    assert(sketch.contains("h2"), sketch.toString)
    // error envelope for every surviving counter: true − N/(cap+1) ≤ est ≤ true
    val truth = (heavies ++ noise).groupBy(identity).view.mapValues(_.size.toLong)
    val slack = n / (capacity + 1)
    sketch.foreach { case (tok, est) =>
      val t = truth(tok)
      assert(est <= t, s"$tok est=$est > true=$t")
      assert(est >= t - slack, s"$tok est=$est < ${t - slack}")
    }
  }

  test("exact regime: capacity ≥ distinct count makes the sketch an exact counter") {
    val mg = new MisraGriesAggregator(16)
    var b = mg.zero
    val stream = Seq("a", "b", "a", "c", "a", "b")
    stream.foreach(t => b = mg.reduce(b, t))
    assert(mg.finish(b).counters === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    assert(mg.finish(b).processed === 6L)
  }
}

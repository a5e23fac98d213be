package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-14b fixture specs: hand-checkable cases for the session's new
  * operators beyond their oracle gates.
  */
class Round14bOpsSpec extends SparkSpecBase {

  test("q332 HITS: planted bipartite star ranks the shared part first and normalizes each side to 1e6") {
    import spark.implicits._
    // customers 1..3 all buy part 10; c1 also buys 11, c2 also buys 12
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L), (3L, 10L))
      .toDF("cust", "part")
    val out = GraphOps.hitsOn(edges, rounds = 3, topK = 15)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val auth = out.filter(_._1 == "auth").sortBy(_._4)
    val hub = out.filter(_._1 == "hub").sortBy(_._4)
    // the shared part dominates authority at exactly the ppm unit
    assert(auth.head._2 === 10L && auth.head._3 === 1000000L)
    // each side's max normalizes to exactly 1e6
    assert(hub.head._3 === 1000000L)
    // the two two-part customers out-hub the one-part customer, tie
    // broken by id — c1 before c2 before c3
    assert(hub.map(_._2).toSeq === Seq(1L, 2L, 3L))
    assert(hub(0)._3 === hub(1)._3 && hub(2)._3 < hub(1)._3)
    // pure function of the input: a second build agrees cell-exactly
    val again = GraphOps.hitsOn(edges, rounds = 3, topK = 15)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === again.toSeq)
  }
}

package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-7 operator batch: per-domain quota cap (q117), XOR table
  * fingerprint (q118), cross-source span overlap (q119), and blocked
  * Levenshtein linkage (q120).
  */
class Linkage7Spec extends SparkSpecBase {
  import spark.implicits._

  // ---- q117 domainCap -------------------------------------------------

  test("domainCap: kept counts respect the cap and prefer long docs") {
    val out = PipelineOps.domainCap(spark, sf0001, cap = 3)
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, nDocs, nKept, _) =>
      assert(nKept <= 3L && nKept <= nDocs && nKept > 0L)
    }
    // chars_kept must equal the sum of the 3 longest docs per source
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"n_chars", $"doc_id")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(
        _.sortBy(d => (-d._2, d._3)).take(3).map(_._2).sum).toMap
    out.foreach { case (src, _, _, chars) => assert(chars === docs(src)) }
  }

  test("domainCap: cap above corpus size keeps everything") {
    val total = graft.Tables.documents(spark, sf0001).count()
    val out = PipelineOps.domainCap(spark, sf0001, cap = Int.MaxValue)
      .agg(sum("n_kept"), sum("chars_kept")).as[(Long, Long)].head()
    assert(out._1 === total)
  }

  // ---- q118 tableFingerprint ------------------------------------------

  test("tableFingerprint: deterministic, order-independent, row-sensitive") {
    val a = IncrementalOps.tableFingerprint(spark, sf0001)
      .as[(String, Long, Long)].collect().toSeq
    val b = IncrementalOps.tableFingerprint(spark, sf0001)
      .as[(String, Long, Long)].collect().toSeq
    assert(a === b && a.nonEmpty)
    // XOR of a group with itself cancels: duplicating every row must
    // zero the fingerprint while doubling n_rows
    val li = graft.Tables.lineitem(spark, sf0001)
    val doubled = li.unionAll(li)
    val payload = concat_ws("|", $"l_orderkey", $"l_partkey", $"l_suppkey",
      $"l_linenumber", $"l_shipdate".cast("date"))
    val fp2 = doubled
      .select($"l_returnflag",
        conv(substring(md5(payload), 18, 15), 16, 10).cast("long").as("fp"))
      .groupBy($"l_returnflag")
      .agg(expr("bit_xor(fp)").as("fingerprint"))
      .as[(String, Long)].collect()
    fp2.foreach { case (_, fp) => assert(fp === 0L) }
  }

  test("tableFingerprint: digest matches the reference hex fold") {
    // one hand-computed row: conv(low 15 md5 hex digits) == BigInt parse
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("201|101|9|4|1997-10-31".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = java.lang.Long.parseLong(h.substring(17, 32), 16)
    val got = spark.range(1).select(
      conv(substring(md5(lit("201|101|9|4|1997-10-31")), 18, 15), 16, 10)
        .cast("long")).as[Long].head()
    assert(got === want)
  }

  // ---- q119 sourceSpanOverlap -----------------------------------------

  test("sourceSpanOverlap: symmetric-free pairs with positive counts") {
    val out = DedupOps.sourceSpanOverlap(spark, sf0001)
      .as[(String, String, Long)].collect()
    out.foreach { case (a, b, n) => assert(a < b && n > 0L) }
  }

  test("sourceSpanOverlap: planted shared span is found") {
    val span = (1 to 16).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span alpha beta", "en", "sA", 10L),
      (2L, s"prefix words here $span", "en", "sB", 10L),
      (3L, "totally different content entirely", "en", "sC", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("linkage7_docs")
    val sh = docs.select($"source",
      explode(graft.functions.Text.wordShingles($"text", 16)).as("g"))
      .select($"source", md5($"g").as("h")).distinct()
    val pairs = sh.as("a").join(sh.as("b"),
        $"a.h" === $"b.h" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .as[(String, String, Long)].collect().toSet
    assert(pairs === Set(("sA", "sB", 1L)))
  }

  // ---- q120 nameLinkage -----------------------------------------------

  test("nameLinkage: pairs are blocked, ordered, within distance") {
    val out = LinkageOps.nameLinkage(spark, sf0001)
      .as[(String, String, String, Int, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (block, a, b, dist, na, nb) =>
      assert(a < b && dist <= 4 && dist > 0 && na > 0 && nb > 0)
      assert(a.endsWith(block) && b.endsWith(block))
    }
  }

  test("nameLinkage: levenshtein agrees with a reference implementation") {
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val out = LinkageOps.nameLinkage(spark, sf0001)
      .as[(String, String, String, Int, Long, Long)].collect()
    out.take(20).foreach { case (_, a, b, dist, _, _) =>
      assert(dist === lev(a, b))
    }
  }
}

package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Date
import java.time.LocalDate

class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Deterministic sample batch from a ScalaCheck generator. */
  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  test("sasDate: epoch, null safety") {
    val got = Seq(Some(0), Some(20545), None).toDF("d")
      .select(Dates.sasDate(col("d")).as("x")).collect().map(r => Option(r.getDate(0)))
    assert(got(0) === Some(Date.valueOf("1960-01-01")))
    assert(got(1) === Some(Date.valueOf("2016-04-01")))
    assert(got(2) === None)
  }

  test("sasDate property: matches LocalDate.plusDays for any day offset") {
    val ns = samples(Gen.choose(-30000, 30000))
    val got = ns.toDF("d").select(Dates.sasDate(col("d"))).collect().map(_.getDate(0))
    ns.zip(got).foreach { case (n, g) =>
      assert(g.toLocalDate === LocalDate.of(1960, 1, 1).plusDays(n.toLong), s"n=$n")
    }
  }

  test("flexDate: both layouts parse, junk rejected") {
    val got = Seq("20160401", "04152016", "D/S", "/   183D", "", "99999999")
      .toDF("s").select(Dates.flexDate(col("s")).as("d"))
      .collect().map(r => Option(r.getDate(0)))
    assert(got(0) === Some(Date.valueOf("2016-04-01")))
    assert(got(1) === Some(Date.valueOf("2016-04-15")))
    assert(got.drop(2).forall(_.isEmpty))
  }

  test("flexDate property: yyyyMMdd round-trips for modern dates") {
    // coalesce order makes yyyyMMdd win even for strings that could also
    // parse as MMddyyyy, so the round-trip always holds.
    val ds = samples(Gen.choose(0L, 20000L).map(LocalDate.of(1990, 1, 1).plusDays(_)))
    val strs = ds.map(_.format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")))
    val got = strs.toDF("s").select(Dates.flexDate(col("s"))).collect().map(_.getDate(0))
    ds.zip(got).foreach { case (d, g) => assert(g.toLocalDate === d, s"d=$d") }
  }

  test("idString: long-safe for > 2^31 ids") {
    val got = Seq(94953870030.0d, 12.0d).toDF("x")
      .select(Dates.idString(col("x"))).as[String].collect()
    assert(got.toSeq === Seq("94953870030", "12"))
  }

  test("text primitives: norm, tokens, shingles, ratios") {
    val df = Seq("  The  quick Brown fox  ").toDF("t")
    assert(df.select(Text.normText(col("t"))).head().getString(0) === "the quick brown fox")
    assert(df.select(Text.tokenCount(col("t"))).head().getInt(0) === 4)
    val sh = df.select(Text.wordShingles(col("t"), 2)).head().getSeq[String](0)
    assert(sh.toSet === Set("the quick", "quick brown", "brown fox"))
    val one = Seq("word").toDF("t").select(Text.wordShingles(col("t"), 3)).head().getSeq[String](0)
    assert(one.isEmpty) // shorter than n → no shingles
    // NULL text → empty array, not null (the pre-codegen contract: the
    // r6 TokenNgrams rewrite was null-propagating until the r7 coalesce;
    // size()/explode consumers must see 0/[], never a null hole)
    val nt = Seq[Option[String]](None).toDF("t")
      .select(Text.wordShingles(col("t"), 2)).head()
    assert(!nt.isNullAt(0) && nt.getSeq[String](0).isEmpty)
    val pr = Seq("ab!!").toDF("t").select(Text.punctRatio(col("t"))).head().getDouble(0)
    assert(math.abs(pr - 0.5) < 1e-12)
    val sr = Seq("the cat the dog").toDF("t").select(Text.stopwordRatio(col("t"))).head().getDouble(0)
    assert(math.abs(sr - 0.5) < 1e-12)
  }

  test("fingerprint: whitespace-insensitive, content-sensitive") {
    val fps = Seq("a b c", "a  B   c", "a b d").toDF("t")
      .select(Text.fingerprintMd5(col("t"))).as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("vector ops: cosine of identical=1, orthogonal=0, lsh bucket stable") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f)),
      (Array(1.0f, 1.0f), Array(2.0f, 2.0f))).toDF("a", "b")
    val cos = df.select(Vectors.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(cos(0) - 1.0) < 1e-12)
    assert(math.abs(cos(1)) < 1e-12)
    assert(math.abs(cos(2) - 1.0) < 1e-12)
    // same vector twice → same bucket, deterministically, across evaluations
    val b = Seq(Array(0.3f, -0.7f, 0.2f), Array(0.3f, -0.7f, 0.2f)).toDF("v")
      .select(Vectors.lshBucket(col("v"), 8)).as[Long].collect()
    assert(b(0) === b(1))
    assert(b(0) >= 0 && b(0) < 256)
  }

  test("round: a negative value that rounds to zero yields POSITIVE zero") {
    // The q79/r6 hazard class, pinned: Catalyst's Round goes through
    // BigDecimal, which cannot represent -0.0, so round(-1e-9, 4) is
    // +0.0 — while DuckDB's round preserves the IEEE sign. Every oracle
    // rounding boundary that can produce a zero from below must
    // normalize with `round(...) + 0.0` (tools/sweep_negzero.py scans
    // for violations). If this assertion ever flips, that normalization
    // strategy must be revisited.
    val z = Seq(-1e-9, -0.00004).toDF("x")
      .select(round(col("x"), 4).as("r")).as[Double].collect()
    z.foreach { v =>
      assert(v === 0.0)
      assert(java.lang.Double.doubleToRawLongBits(v) === 0L,
        "Spark round must emit +0.0, not -0.0, for negative-tiny input")
    }
    // and the fold identity the oracles rely on: -0.0 + 0.0 == +0.0
    assert(java.lang.Double.doubleToRawLongBits(-0.0 + 0.0) === 0L)
  }
}

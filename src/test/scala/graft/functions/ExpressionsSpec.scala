package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("native cosine ≡ composed HOF formulation on real embeddings") {
    val emb = graft.Tables.embeddings(spark, sf0001).limit(50)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = graft.Tables.embeddings(spark, sf0001).limit(50)
      .select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val diff = pairs.select(
        Vectors.cosine(col("va"), col("vb")).as("fast"),
        Vectors.cosineHof(col("va"), col("vb")).as("hof"))
      .select(max(abs(col("fast") - col("hof"))).as("d")).head().getDouble(0)
    assert(diff === 0.0) // bit-identical accumulation order
  }

  test("native cosine ≡ HOF on double and MIXED float/double arrays (the IVF assignment shape)") {
    // float corpus × double codebook is exactly ivfAssign's hot path —
    // the expression must pick the element accessor per SIDE
    val emb = graft.Tables.embeddings(spark, sf0001).limit(50)
    val mixed = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .join(graft.Tables.embeddings(spark, sf0001).limit(50)
        .select(col("vec_id").as("ib"),
          col("embedding").cast("array<double>").as("vb")),
        col("ia") < col("ib"))
    val dMixed = mixed.select(
        Vectors.cosine(col("va"), col("vb")).as("fast"),
        Vectors.cosineHof(col("va"), col("vb")).as("hof"))
      .select(max(abs(col("fast") - col("hof"))).as("d")).head().getDouble(0)
    assert(dMixed === 0.0)
    val both = mixed.select(col("va").cast("array<double>").as("va"), col("vb"))
    val dBoth = both.select(
        Vectors.cosine(col("va"), col("vb")).as("fast"),
        Vectors.cosineHof(col("va"), col("vb")).as("hof"))
      .select(max(abs(col("fast") - col("hof"))).as("d")).head().getDouble(0)
    assert(dBoth === 0.0)
  }

  test("native dot ≡ HOF dot on float, double, and mixed arrays; null/mismatch semantics") {
    val emb = graft.Tables.embeddings(spark, sf0001).limit(50)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .join(graft.Tables.embeddings(spark, sf0001).limit(50)
        .select(col("vec_id").as("ib"), col("embedding").as("vb")),
        col("ia") < col("ib"))
    def maxDiff(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      pairs.select(max(abs(Vectors.dotNative(a, b) - Vectors.dot(a, b))).as("d"))
        .head().getDouble(0)
    assert(maxDiff(col("va"), col("vb")) === 0.0)
    assert(maxDiff(col("va").cast("array<double>"), col("vb")) === 0.0)
    assert(maxDiff(col("va").cast("array<double>"),
      col("vb").cast("array<double>")) === 0.0)
    val edge = Seq((Some(Array(1.0f, 2.0f)), Some(Array(3.0f))),
        (None, Some(Array(1.0f))))
      .toDF("a", "b")
      .select(Vectors.dotNative(col("a"), col("b"))).collect()
    assert(edge(0).isNullAt(0)) // length mismatch
    assert(edge(1).isNullAt(0)) // null side
  }

  test("native cosine null/edge semantics") {
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(0.0f, 0.0f))), // zero norm → 0.0
      (None, Some(Array(1.0f, 0.0f))))                    // null → null
      .toDF("a", "b")
    val got = df.select(Vectors.cosine(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) === 0.0)
    assert(got(1).isNullAt(0))
    // length mismatch → null
    val mm = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b"))).head()
    assert(mm.isNullAt(0))
  }

  test("lsh bucket: deterministic, bounded, similar vectors collide") {
    val v = Array(0.5f, -0.25f, 0.8f, 0.1f)
    val nearly = v.map(_ * 1.001f) // same direction → same signs
    val got = Seq(v, nearly, v.map(-_)).toDF("v")
      .select(Vectors.lshBucket(col("v"), 10)).as[Long].collect()
    assert(got(0) === got(1))
    assert(got(0) !== got(2)) // antipodal → complement bucket
    assert(got.forall(b => b >= 0 && b < 1024))
  }

  test("TopKAggregator: bounded buffer, ordering, merge") {
    val agg = new TopKAggregator(3)
    val items = Seq(ScoredId(1, 0.5), ScoredId(2, 0.9), ScoredId(3, 0.9),
      ScoredId(4, 0.1), ScoredId(5, 0.7))
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).map(_.id) === Seq(2, 3, 5)) // score desc, id asc tiebreak
    val merged = agg.merge(
      items.take(2).foldLeft(agg.zero)(agg.reduce),
      items.drop(2).foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged).map(_.id) === Seq(2, 3, 5))
  }

  test("rp sign rows ≡ Spark-md5 SQL derivation; projection dot bit-equal fused-loop vs HOF") {
    // the driver-computed sign matrix literal must equal the
    // md5(i || '_' || j) SQL derivation — the exact expression the
    // DuckDB oracle regenerates, and what the r5 shuffled formulation
    // computed via Spark's md5 function
    val fromSql = spark.range(64).select(col("id").as("i"))
      .crossJoin(spark.range(16).select(col("id").as("j")))
      .select(col("j"), col("i"),
        when(substring(md5(concat(col("i"), lit("_"), col("j"))), 1, 1) < "8",
          lit(1.0)).otherwise(lit(-1.0)).as("sgn"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (j, rows) =>
        j -> rows.sortBy(_._2).map(_._3).toSeq }
    (0 until 16).foreach { j =>
      assert(fromSql(j.toLong) ===
        graft.operators.SimilarityOps.rpSignRow(j).toSeq, s"sign row $j")
    }
    // each projected coordinate: codegen fused loop ≡ interpreted HOF —
    // both accumulate in index order, so the difference is exactly 0 bits
    // (this is the q79 parity contract on the Spark side)
    val emb = graft.Tables.embeddings(spark, sf0001).limit(50)
    val srow = lit(graft.operators.SimilarityOps.rpSignRow(0))
    val d = emb.select(max(abs(
        Vectors.dotNative(col("embedding"), srow) -
          Vectors.dot(col("embedding"), srow))).as("d")).head().getDouble(0)
    assert(d === 0.0)
  }

  test("pqAdcScores: output layout, null/mismatch semantics, hand-checked tiny case") {
    // m=2, k=2, w=2, one query. Codebook: s0 -> {(1,0),(0,1)}, s1 -> {(1,1),(2,2)}
    val cbFlat = Array(1.0, 0.0, 0.0, 1.0, 1.0, 1.0, 2.0, 2.0)
    val cnorm2 = Array(1.0, 1.0, 2.0, 8.0)
    // lut[(q*m+s)*k+c] for q=0: s0 codes -> (10, 20), s1 codes -> (30, 40)
    val lut = Array(10.0, 20.0, 30.0, 40.0)
    val df = Seq((Some(Array(1.0f, 0.1f, 1.2f, 1.1f)), 1),
        (None, 2)).toDF("v", "tag")
      .select(col("tag"), Vectors.pqAdcScores(col("v"), lit(cbFlat),
        lit(cnorm2), lit(lut), 2, 2).as("sc"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    // s0: sv=(1, .1): dist to (1,0)=.01, to (0,1)=1.81 -> code 0
    // s1: sv=(1.2,1.1): dist to (1,1)=.05, to (2,2)=1.45 -> code 0
    // layout [adc_0, vnorm2, code_0, code_1] = [10+30, 1+2, 0, 0]
    assert(df(1) === Seq(40.0, 3.0, 0.0, 0.0))
    assert(df(2) === null) // null vector
    // dim not divisible by m -> null
    val bad = Seq(Array(1.0f, 2.0f, 3.0f)).toDF("v")
      .select(Vectors.pqAdcScores(col("v"), lit(cbFlat), lit(cnorm2),
        lit(lut), 2, 2)).head()
    assert(bad.isNullAt(0))
  }

  test("tokenNgrams: ≡ HOF formulation on real docs; index provenance; edge cases") {
    val n = 10
    val docs = graft.Tables.documents(spark, sf0001).limit(100)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val hof = transform(
      when(size(col("toks")) >= n,
        sequence(lit(0), size(col("toks")) - n))
        .otherwise(array().cast("array<int>")),
      i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))
    val diff = docs.select(
        Text.tokenNgramsNative(col("toks"), n).as("fast"), hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
    // index provenance + edges on constructed rows: exactly-n tokens
    // (one span), n-1 (none), nulls inside tokens skipped like concat_ws
    val tiny = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a", "b")),
      (3L, Seq.empty[String])).toDF("doc_id", "toks")
    val out = tiny.select(col("doc_id"),
      Text.tokenNgramsNative(col("toks"), 3).as("g")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[String]]("g")).toMap
    assert(out(1L) === Seq("a b c"))
    assert(out(2L) === Seq.empty)
    assert(out(3L) === Seq.empty)
    // bigram index i covers tokens [i, i+2)
    val bi = tiny.filter(col("doc_id") === 1)
      .select(posexplode(Text.tokenNgramsNative(col("toks"), 2))
        .as(Seq("pos", "g"))).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(bi === Map(0 -> "a b", 1 -> "b c"))
  }

  test("tokenLcp: ≡ zip_with/array_position HOF on real adjacent suffixes; edge cases") {
    // the q354 kernel parity: the fused loop must equal the HOF form on
    // the exact pair population it replaced — adjacent 12-token
    // suffixes of the real corpus
    val maxLcp = 12
    val sfx = graft.Tables.documents(spark, sf0001).limit(100)
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "t1")),
        col("w"))
      .select(col("doc_id"), col("pos"), col("t1"),
        slice(col("w"), col("pos") + 1, lit(maxLcp)).as("s"))
      .withColumn("k", concat_ws(" ", col("s")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("t1")).orderBy(col("k"), col("doc_id"), col("pos"))
    val adj = sfx.withColumn("ns", lead(col("s"), 1).over(win))
      .filter(col("ns").isNotNull)
    val hof = {
      val p0 = array_position(zip_with(col("s"), col("ns"),
        (x, y) => coalesce(x === y, lit(false))), false)
      when(p0 === 0, least(size(col("s")), size(col("ns"))))
        .otherwise(p0 - 1).cast("long")
    }
    val diff = adj.select(Text.tokenLcpNative(col("s"), col("ns")).as("fast"),
        hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() === 0)
    // edges: equal arrays -> full length; prefix relation -> shorter
    // length; null element stops the scan; empty -> 0; null array -> null
    val tiny = Seq(
      (1L, Seq("a", "b"), Seq("a", "b")),
      (2L, Seq("a", "b"), Seq("a", "b", "c")),
      (3L, Seq("a", "x"), Seq("a", "y")),
      (4L, Seq.empty[String], Seq("a"))).toDF("id", "a", "b")
    val out = tiny.select(col("id"),
        Text.tokenLcpNative(col("a"), col("b")).as("l")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
    val withNullElem = Seq((1L, Seq("a", null, "c"), Seq("a", null, "c")))
      .toDF("id", "a", "b")
      .select(Text.tokenLcpNative(col("a"), col("b")).as("l")).collect()
    assert(withNullElem.head.getLong(0) === 1L,
      "a null element is a mismatch (the coalesce(x=y,false) contract)")
    val nullArr = Seq((1L, Seq("a"))).toDF("id", "a")
      .select(Text.tokenLcpNative(col("a"), lit(null).cast("array<string>"))
        .as("l")).collect()
    assert(nullArr.head.isNullAt(0))
  }

  test("q43 aggregator top-k ≡ q31 window top-k") {
    val a = graft.operators.SimilarityOps.topKViaAggregator(spark, sf0001).collect()
    val b = graft.operators.SimilarityOps.bruteForceTopK(spark, sf0001).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }
}

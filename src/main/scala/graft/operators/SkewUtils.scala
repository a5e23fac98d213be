package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins: salting. AQE's skew-join split
  * handles sort-merge skew at runtime; explicit salting is the plan-level
  * tool when one side has pathological hot keys (e.g. a null-heavy FK or
  * a mega-city port code at 100 TB) and the other side is small enough to
  * replicate `nSalts`×.
  */
object SkewUtils {

  /** Equi-join `fact ⋈ dim` on `key`, spreading each hot fact key over
    * `nSalts` shuffle partitions: the fact side gets a deterministic salt
    * from its whole row (uniform, no RNG state), the dim side is exploded
    * once per salt value. Result-identical to the unsalted join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    // outer types that preserve unmatched DIM rows would emit them once
    // per salt replica — not expressible under salting without a dedupe
    require(Set("inner", "left", "left_outer", "leftouter")(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltExpr: Column =
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(nSalts))
    val saltedFact = fact.withColumn("__salt", saltExpr)
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
          saltedFact("__salt") === saltedDim("__salt"), joinType)
      .drop(saltedDim(key))
      .drop(saltedFact("__salt")).drop(saltedDim("__salt"))
  }
}

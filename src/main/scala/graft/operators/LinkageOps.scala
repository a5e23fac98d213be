package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-resolution operators: fuzzy record linkage over string keys.
  * The reference's model keys everything on exact surrogate/natural keys
  * (SURVEY.md §1.1); this is the extension a real ingest needs when the
  * same entity arrives with spelling drift ("cold widget" vs "gold
  * widget") — classic blocked edit-distance linkage.
  */
object LinkageOps {

  /** Blocked fuzzy linkage over part names (q120): candidate pairs of
    * DISTINCT names that share a blocking key (the last name token) and
    * sit within `maxDist` Levenshtein edits, annotated with how many
    * records carry each spelling.
    *
    * Scale shape: the quadratic step runs on the DISTINCT-name table,
    * which is vocabulary-bounded (it stops growing once every spelling
    * has been seen), never on records — 100 TB of parts collapses to the
    * same few thousand names before any pair is formed. Within a block
    * the pair count is (names-per-block)², kept small by blocking; the
    * name table broadcasts, so the only corpus-sized work is the
    * distinct-count aggregation.
    */
  def nameLinkage(spark: SparkSession, dir: String,
      maxDist: Int = 4): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("block", element_at(split(col("name"), " "), -1))
    names.as("a")
      .join(broadcast(names.as("b")),
        col("a.block") === col("b.block") && col("a.name") < col("b.name"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist") <= maxDist)
      .select(col("a.block").as("block"), col("a.name").as("name_a"),
        col("b.name").as("name_b"), col("dist"),
        col("a.n_parts").as("n_a"), col("b.n_parts").as("n_b"))
      .orderBy(col("block"), col("name_a"), col("name_b"))
  }
}

package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewUtilsSpec extends SparkSpecBase {

  test("salted join ≡ plain join on skewed data (inner and left)") {
    import spark.implicits._
    // hot key: 1000 rows of nation 0, a few of others
    val fact = ((1 to 1000).map(i => (0, s"row$i")) ++ Seq((1, "x"), (2, "y"), (9, "orphan")))
      .toDF("n_key", "payload")
    val dim = Seq((0, "ZERO"), (1, "ONE"), (2, "TWO")).toDF("n_key", "name")

    val plain = fact.join(dim, Seq("n_key")).select("n_key", "payload", "name")
    val salted = SkewUtils.saltedJoin(fact, dim, "n_key", nSalts = 8)
      .select("n_key", "payload", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    val plainLeft = fact.join(dim, Seq("n_key"), "left").select("n_key", "payload", "name")
    val saltedLeft = SkewUtils.saltedJoin(fact, dim, "n_key", nSalts = 8, "left")
      .select("n_key", "payload", "name")
    assert(saltedLeft.exceptAll(plainLeft).isEmpty && plainLeft.exceptAll(saltedLeft).isEmpty)
    // the orphan key survives the left join with null name
    assert(saltedLeft.filter(col("n_key") === 9 && col("name").isNull).count() === 1)
  }
}

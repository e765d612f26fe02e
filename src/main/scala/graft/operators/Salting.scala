package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join split handles most runtime skew; explicit salting is the
  * deterministic-plan fallback for pathological producers (one key = 30% of
  * a 100 TB fact table): the big side spreads each key over `salt`
  * sub-partitions, the small side replicates `salt`× — turning one hot
  * shuffle partition into `salt` even ones at the cost of a bounded
  * replication of the small side.
  *
  * Result set is provably identical to the plain equi-join (each big-side
  * row joins the one replicated copy matching its salt); the salt columns
  * never escape.
  */
object Salting {

  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, salt: Int): DataFrame = {
    require(salt > 0)
    val b = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val sm = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(sm, b(bigKey) === sm(smallKey) && b("__salt") === sm("__salt"))
      .drop("__salt")
  }
}

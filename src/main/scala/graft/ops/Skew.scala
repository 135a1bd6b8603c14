package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §7.4 / 100 TB north star).
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default with AQE); salting is
  * the explicit fallback when a single key dwarfs every partition — e.g. the
  * reference's interaction graph where one gym location hosts most checkins
  * (`/root/reference/data_pipeline/build_customer_interactions.py:123-177`).
  *
  * The big side scatters each row into one of `salts` sub-keys; the small side
  * replicates each row to all `salts` sub-keys. Join on (key, salt) and the
  * hot key's work spreads over `salts` reducers. Semantics identical to the
  * plain equi-join (proved by test).
  */
object Skew {

  /** Salted inner equi-join of `big` ⋈ `small` on big(bigKey) == small(smallKey). */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      floor(rand(seed = 7) * salts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}

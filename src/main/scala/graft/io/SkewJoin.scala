package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys: salt the big (skewed) side into
  * `saltFactor` sub-keys and replicate the small side across all salts,
  * turning one monster shuffle partition into `saltFactor` even ones.
  * AQE's skew-join handling covers most cases at runtime; explicit
  * salting is the deterministic fallback when a key's volume exceeds what
  * a single executor can hold (the 100 TB "power user" case).
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltFactor: Int, seed: Long = 42L): DataFrame = {
    require(saltFactor > 0)
    val salted = big.withColumn("__salt",
      floor(rand(seed) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

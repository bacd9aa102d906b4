package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions (SURVEY §4.2; DynamoDB
  * partition keys are exactly the kind of column where one hot key can
  * dominate — a single PK owning 10% of 100 TB stalls one reducer).
  *
  * AQE's skew-join split handles sort-merge cases automatically; salting is
  * the explicit fallback that also covers aggregations-after-join and
  * engines/plans AQE can't split. Mechanics: the skewed (large) side gets a
  * deterministic salt in [0, S); the small side is replicated S times; the
  * join key becomes (key, salt), spreading each hot key over S reducers.
  * Replication cost is S×|small|, so keep S modest (8-32).
  */
object SkewJoin {

  /** Inner equi-join of `large` (skewed) with `small` on `keys`,
    * salted `salt` ways. Result equals `large.join(small, keys)`. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int = 16): DataFrame = {
    require(salt > 0, "salt factor must be positive")
    // deterministic per-row salt: hash of the full row spreads a hot key's
    // rows uniformly without needing a random (non-deterministic) column
    val salted = large.withColumn("_salt",
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}

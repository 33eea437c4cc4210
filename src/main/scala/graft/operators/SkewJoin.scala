package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware equi-join via key salting.
  *
  * AQE's skew-join handles most cases at runtime; salting is the explicit
  * lever when a handful of hot keys dominate (e.g. one document id carrying
  * millions of chunks): the skewed side gets a random salt in [0, n), the
  * small side is replicated n ways, and the join key becomes (key, salt) —
  * one hot partition turns into n even ones.
  */
object SkewJoin {

  /** @param big    the skewed large side
    * @param small  the replicable side (each row duplicated `salts` times)
    * @param keys   equi-join keys
    * @param salts  fan-out factor for hot keys
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(salts > 0)
    // deterministic spread: hash of the full row modulo salts — avoids rand()
    // (which breaks task-retry determinism)
    val saltedBig = big.withColumn(
      "_salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts)).cast("int")
    )
    val replicated = small
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig
      .join(replicated, keys :+ "_salt", joinType)
      .drop("_salt")
  }
}

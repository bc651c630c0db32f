package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Join helpers for skewed data.
  *
  * At 100 TB the classic failure mode of a shuffle join is one hot key
  * (a null-ish default id, a celebrity user, a boilerplate document)
  * landing an entire shuffle partition on one executor. AQE's skew-join
  * split handles moderate skew after the fact; salting removes it by
  * construction, which also fixes the cases AQE cannot touch (skew inside
  * a single key, aggregation-free pipelines).
  */
object Joins {

  /** Equi-join `big ⋈ small` with the hot-key pressure spread over `salt`
    * sub-keys: every big-side row picks one of `salt` salt values, the
    * small side is replicated into all of them, and the join key becomes
    * (key, salt) — each original key's rows now land on `salt` shuffle
    * partitions instead of one.
    *
    * The join RESULT is identical to the unsalted join for any salt
    * assignment (the small side matches every salt value), so the big-side
    * salt can be anything uniform; a hash of the row's key plus a
    * monotonic row id keeps it spread even when one key dominates.
    *
    * Use when the small side is too big to broadcast but cheap to
    * replicate `salt`x; `salt` multiplies small-side shuffle volume, so
    * keep it near the executor-count scale, not the row-count scale.
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKeys: Seq[String], smallKeys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1: $salt")
    require(bigKeys.length == smallKeys.length && bigKeys.nonEmpty,
      "bigKeys and smallKeys must be same-length and non-empty")
    // right/full outer would emit `salt` null-padded copies of every
    // unmatched small-side row (each replica fails to match) — only join
    // types whose result is salt-invariant are allowed
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
        "leftanti", "anti").contains(normalized),
      s"saltedJoin supports inner/left/semi/anti joins; $joinType would " +
        "duplicate unmatched replicated rows (flip the sides instead)")
    val b = big.withColumn("_salt",
      pmod(xxhash64(bigKeys.map(col) :+ monotonically_increasing_id(): _*),
        lit(salt.toLong)).cast("int"))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    val cond = bigKeys.zip(smallKeys)
      .map { case (bk, sk) => b(bk) === s(sk) }
      .reduce(_ && _) && b("_salt") === s("_salt")
    b.join(s, cond, joinType).drop("_salt")
  }
}

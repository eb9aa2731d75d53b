package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting for hot join keys (SURVEY.md §4). A key carrying a
  * disproportionate share of a fact table serializes into one task;
  * salting splits it across `salts` tasks by widening the join key,
  * replicating only the (small) build side. AQE's skew-join handles
  * moderate skew automatically — explicit salting is for the
  * pathological keys (null-ish ids, bot users) that exceed what
  * runtime splitting can fix.
  */
object Salt {

  /** Equi-join `fact ⋈ dim` on `factKey = dimKey`, salted `salts`
    * ways: the fact side gets a per-row DETERMINISTIC salt (a hash of
    * the whole row), the dim side is exploded `salts` times. Result
    * rows equal the unsalted join exactly — including under task
    * RETRY: a salt derived from spark_partition_id /
    * monotonically_increasing_id changes when a lost map task
    * recomputes with a different shuffle-read order, and a row whose
    * salt changed between the original and retried attempt hashes to
    * a DIFFERENT reduce partition — already-committed reducers used
    * the old salt, rerun ones see the new one, so rows join zero or
    * two times (the SPARK-23207 failure class). Hashing the row's own
    * columns is retry-stable; identical rows sharing a salt is fine —
    * the goal is spreading a hot KEY, and a hot key's rows differ in
    * their other columns.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}

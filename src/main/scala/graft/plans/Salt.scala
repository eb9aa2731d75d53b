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
    * ways: the fact side gets a per-row deterministic-per-run salt,
    * the dim side is exploded `salts` times. Result rows equal the
    * unsalted join exactly.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) && saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}

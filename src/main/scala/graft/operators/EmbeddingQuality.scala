package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space data-quality operators for training-data curation:
  * centroid-distance outlier detection and hard-negative mining.
  * Extends the reference's vector surface
  * (terrorblade/data/database/vector_store.py:224-302 cosine search)
  * with the two embedding-side screens a pretraining/finetuning
  * pipeline runs: "which vectors don't belong to their labeled
  * group" (mislabeled/garbage detection) and "which near-misses make
  * the best contrastive negatives".
  *
  * Determinism: centroids are per-dimension DECIMAL(18,6) sums of
  * 6dp-rounded components divided by counts (the q42 decimal-mean
  * pattern — order-insensitive under any partitioning and bit-equal
  * to the DuckDB oracle); similarities are 6dp-rounded at the
  * surface with unique-key tie-breaks.
  */
object EmbeddingQuality {

  /** Per-label centroids as ordered ARRAY<DOUBLE>: posexplode →
    * (label, dim) decimal-mean → re-assembled in dim order.
    * One shuffle on (label, dim) — skew-free keys; output is
    * nLabels rows, always broadcastable.
    */
  private[operators] def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(sum(round(col("v").cast("double"), 6).cast("decimal(18,6)")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("m", col("s").cast("double") / col("n"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        x => x.getField("m")).as("cvec"))

  /** q61: per-label embedding outliers — the `bottomK` vectors least
    * cosine-similar to their own label's centroid (mislabeled/garbage
    * screening). One corpus scan + a broadcast join against nLabels
    * centroid rows; ranking is a per-label window over the scored
    * scan — the same map-side-scored shape as q16, so it holds at
    * 100 TB (the window shuffles on label; skewed labels would rank
    * via the q23-style per-partition top-k merge, not needed at the
    * tested sizes).
    */
  def embeddingOutliers(spark: SparkSession, dir: String, bottomK: Int = 5): DataFrame = {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
    val w = Window.partitionBy("label").orderBy(col("csim").asc, col("vec_id"))
    e.join(broadcast(labelCentroids(spark, dir)), "label")
      .withColumn("csim", round(expr("cosine_sim(embedding, cvec)"), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= bottomK)
      .select(col("vec_id"), col("label"), col("csim"), col("rk").cast("int").as("rk"))
      .orderBy("label", "rk")
  }

  /** q62: hard-negative mining — for each anchor (deterministic
    * vec_id residue sample), the top-k most cosine-similar vectors
    * with a DIFFERENT label: the classic contrastive-training
    * negatives. Brute-force nested-loop over N×nAnchors with
    * nAnchors ∝ N — O(N²/anchorMod) cosines: the ORACLE-checkable
    * exact semantics, kept as the correctness twin of the IVF-pruned
    * scale path `hardNegativesIvf` (the q29/q29b split; VERDICT r06
    * named this brute force the last O(N²) shape in the engine).
    */
  def hardNegatives(spark: SparkSession, dir: String,
                    k: Int = 5, anchorMod: Int = 101): DataFrame = {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
    val anchors = e.filter(col("vec_id") % anchorMod === 0)
      .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"),
        col("embedding").as("avec"))
    val w = Window.partitionBy("anchor_id").orderBy(col("sim").desc, col("vec_id"))
    e.join(broadcast(anchors), col("label") =!= col("anchor_label"))
      .withColumn("sim", round(expr("cosine_sim(embedding, avec)"), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("anchor_id"), col("anchor_label"), col("vec_id"), col("label"),
        col("sim"), col("rk").cast("int").as("rk"))
      .orderBy("anchor_id", "rk")
  }

  /** q62b: IVF-pruned hard-negative mining — the 100 TB spelling of
    * q62. Candidates come from the persisted MINING index
    * (VectorIndex.buildMining: fine cells ≈ N/125 vectors each,
    * inverted lists carrying vec_id+label+embedding):
    *
    *   1. anchors rank cells through the shared two-level
    *      `Vectors.assignCells` kernel (coarse→fine, ~√nLists cosines
    *      per anchor — never an N×nLists crossJoin) and keep their
    *      top `nProbe` cells;
    *   2. an EQUALITY join on cell pulls each probed cell's inverted
    *      list — shuffles on the cell key at scale, never an O(N)
    *      broadcast of the anchor set;
    *   3. cross-label filter, cosine scoring, per-anchor top-k.
    *
    * Per-anchor work is nProbe·(N/nLists) ≈ nProbe·125 candidate
    * cosines — CONSTANT under the IVF sizing law — so total mining
    * cost is O(N·nProbe·cellSize/anchorMod): linear in the corpus,
    * vs the brute twin's quadratic (measured in tools.NegMineProbe).
    * Approximate by construction (a true negative hiding in a
    * non-probed cell is missed): EXACT-dup cross-label negatives are
    * always recovered — identical vectors rank cells identically, so
    * the anchor's top probe IS the negative's cell (spec-pinned);
    * corpus recall vs the brute twin is measured in NegMineProbe.
    * Rows-only in the driver gate (blocking is engine-internal),
    * cross-validated against `hardNegatives` in the spec.
    */
  def hardNegativesIvf(spark: SparkSession, dir: String,
                       k: Int = 5, anchorMod: Int = 101,
                       nProbe: Int = 3, nLists: Int = 0): DataFrame = {
    GraftFunctions.register(spark)
    val path = VectorIndex.miningPath(spark, dir)
    val params = VectorIndex.miningParams(nLists, refineIters = 0)
    if (!VectorIndex.fresh(spark, dir, path, params))
      VectorIndex.buildMining(spark, dir, path, nLists)
    val cents = VectorIndex.centroids(spark, path)
      .select(col("cell").as("c_cell"), col("cvec"))
    val nCells = cents.count().toInt
    val anchors = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % anchorMod === 0)
      .select(col("vec_id"), col("label").as("anchor_label"), col("embedding"))
    val probes = Vectors.assignCells(anchors.select("vec_id", "embedding"), cents,
        nProbe = nProbe, nCoarse = Vectors.autoCoarse(nCells))
      .join(anchors, "vec_id")
      .select(col("vec_id").as("anchor_id"), col("anchor_label"),
        col("embedding").as("avec"), col("cell"))
    val w = Window.partitionBy("anchor_id").orderBy(col("sim").desc, col("vec_id"))
    VectorIndex.cells(spark, path)
      .join(probes, Seq("cell"))
      .filter(col("label") =!= col("anchor_label"))
      .withColumn("sim", round(expr("cosine_sim(embedding, avec)"), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("anchor_id"), col("anchor_label"), col("vec_id"), col("label"),
        col("sim"), col("rk").cast("int").as("rk"))
      .orderBy("anchor_id", "rk")
  }
}

package graft.mcp

import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.{TextEncoder, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MCP-shaped serving adapter — the reference's four MCP tools
  * (/root/reference/terrorblade/mcp/server.py:119-379: vector_search /
  * cluster_search / get_cluster / random_large_cluster) re-expressed
  * as a PURE FUNCTION surface over the library's own operators. No
  * transport: the sandbox runs no service processes, and an MCP host
  * would wrap these four calls 1:1 — every tool body below is exactly
  * the query its reference twin runs, so the serving layer adds no
  * query logic of its own (the same division the reference makes:
  * server.py delegates to VectorStore/TelegramDatabase).
  *
  * Model mapping (testdata schema ↔ reference schema):
  *   embeddings.vec_id ↔ message embedding id; documents.doc_id ↔
  *   message id (q18's join contract); documents.source ↔ chat_id;
  *   Vectors.semanticGroups' (source, group_id) ↔ the reference's
  *   (chat_id, group_id) cluster key (cluster_search aggregates by
  *   exactly that pair, server.py:241-246).
  *
  * The query string is embedded with TextEncoder (q49's deterministic
  * batched encoder contract — the seam a real model plugs into;
  * server.py's _encode_query is the same seam around
  * SentenceTransformer). Scale shape: the single query vector rides a
  * broadcast literal onto one corpus scan (q16's plan); cluster
  * joins broadcast the k-bounded hit set (q18's plan); nothing here
  * shuffles the corpus.
  */
object McpTools {

  /** Embedding dimensionality, memoized per (session, dir, source
    * token): deriving it is a head-of-scan Spark job, and a serving
    * adapter must not pay that on EVERY vectorSearch/clusterSearch
    * call (ADVICE r11). The source token in the key tracks what the
    * Tables cache itself tracks — a registerOverride or a source
    * regeneration changes the token, so a stale dim can never be
    * served against a re-registered embeddings frame (the dim IS a
    * property of the corpus bytes, not of the (session, dir) pair).
    * The Spark job runs OUTSIDE the map's bin lock (get-then-
    * putIfAbsent), so concurrent serving calls on other corpora are
    * never blocked behind a scan; stopped sessions are evicted on
    * touch (Tables' leak-bound rule).
    */
  private val dimCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), java.lang.Integer]()

  private def embeddingDim(spark: SparkSession, dir: String): Int = {
    dimCache.keySet.removeIf(_._1.sparkContext.isStopped)
    val key = (spark, dir, Tables.sourceToken(spark, dir, "embeddings"))
    Option(dimCache.get(key)).map(_.intValue).getOrElse {
      val dim = Tables.embeddings(spark, dir).select(size(col("embedding"))).head.getInt(0)
      dimCache.putIfAbsent(key, dim)
      dim
    }
  }

  /** vector_search (server.py:119-189): semantic top-k with text +
    * optional source (chat) filter, similarity threshold, and the
    * hit's cluster id. `includeClusterContext` adds the cluster's
    * leading preview — the compact cluster snippet of the reference.
    */
  def vectorSearch(spark: SparkSession, dir: String, query: String,
                   topK: Int = 10, source: Option[String] = None,
                   similarityThreshold: Double = 0.0,
                   includeClusterContext: Boolean = true): DataFrame =
    searchScored(spark, dir, queryScoredImpl(spark, dir, query),
      topK, source, similarityThreshold, includeClusterContext)

  /** vector_search for a query that arrives ALREADY EMBEDDED — the
    * tool surface below the encoder seam (the reference's
    * VectorStore.search takes the query vector; _encode_query /
    * TextEncoder sit above it). The query is a corpus vector named by
    * id, which is what makes this leg ORACLE-EXPRESSIBLE end-to-end
    * (q81: DuckDB can name the same vector and replay the whole
    * pipeline; the text leg's encoder is a deterministic stub with
    * nothing to oracle — q49's rows-only contract).
    */
  def vectorSearchById(spark: SparkSession, dir: String, vecId: Long,
                       topK: Int = 10, source: Option[String] = None,
                       similarityThreshold: Double = 0.0,
                       includeClusterContext: Boolean = true): DataFrame = {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") === vecId).select(col("embedding").as("qvec"))
    val scored = e.crossJoin(broadcast(q))
      .withColumn("sim", round(expr("cosine_sim(embedding, qvec)"), 6))
      .drop("qvec", "embedding")
    searchScored(spark, dir, scored, topK, source, similarityThreshold, includeClusterContext)
  }

  private def searchScored(spark: SparkSession, dir: String, scored: DataFrame,
                           topK: Int, source: Option[String],
                           similarityThreshold: Double,
                           includeClusterContext: Boolean): DataFrame = {
    require(topK > 0 && topK <= 1000, "top_k must be in the range 1..1000")
    require(similarityThreshold >= 0.0 && similarityThreshold <= 1.0,
      "similarity_threshold must be between 0.0 and 1.0")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        substring(col("text"), 1, 40).as("preview"))
    val groups = Vectors.semanticGroups(spark, dir)
      .select(col("doc_id"), col("source").as("g_source"), col("group_id"))
    val scoredDocs = scored
      .join(docs, col("vec_id") === col("doc_id"))
    val filtered = source.fold(scoredDocs)(s => scoredDocs.filter(col("source") === s))
      .filter(col("sim") >= similarityThreshold)
    // top-k as orderBy+limit = TakeOrderedAndProject (distributed
    // per-partition top-k, merged on the driver) — NEVER a global
    // row_number window, which would single-task the corpus. The rank
    // window below runs over the already-k-bounded frame (≤1000 rows).
    val w = Window.orderBy(col("sim").desc, col("vec_id"))
    // group join is INNER with the k-bounded side broadcast: a left
    // join would pin the ≤1000-row hit frame as the preserved side
    // (un-broadcastable) and sort-merge the corpus-sized group frame
    // instead (plan-audited r13). Inner is LOSSLESS here by
    // construction — hits and semanticGroups have identical support
    // (both are documents ⋈ embeddings), so no hit can lack a group.
    val hits = broadcast(filtered
        .orderBy(col("sim").desc, col("vec_id")).limit(topK)
        .withColumn("rk", row_number().over(w)))
      .join(groups.drop("g_source"), Seq("doc_id"))
      .select("vec_id", "sim", "rk", "source", "lang", "preview", "group_id")
    if (!includeClusterContext) hits.orderBy("rk")
    else {
      // cluster snippet = the group's leading member's preview (min
      // doc_id — deterministic), the compact analog of the
      // reference's include_cluster_messages text
      val lead = Vectors.semanticGroups(spark, dir)
        .groupBy(col("source").as("c_source"), col("group_id").as("c_group"))
        .agg(min("doc_id").as("lead_id"))
        .join(Tables.documents(spark, dir).select(col("doc_id").as("lead_id"),
          substring(col("text"), 1, 40).as("cluster_preview")), "lead_id")
        .select("c_source", "c_group", "cluster_preview")
      hits.join(broadcast(lead),
          col("source") === col("c_source") && col("group_id") === col("c_group"), "left")
        .select(col("vec_id"), col("sim"), col("rk"), col("source"), col("lang"),
          col("preview"), col("group_id"), col("cluster_preview"))
        .orderBy("rk")
    }
  }

  /** One corpus scan scored against the encoded query — the shared
    * kernel of vector_search and cluster_search (they differ only in
    * aggregation, exactly as in the reference): the query vector is a
    * broadcast literal on q16's plan shape.
    */
  private def queryScoredImpl(spark: SparkSession, dir: String, query: String): DataFrame = {
    require(query.trim.nonEmpty, "query must be a non-empty string")
    GraftFunctions.register(spark)
    val qvec = TextEncoder.encodeBatch(Seq(query), embeddingDim(spark, dir)).head
    val qlit = array(qvec.map(lit(_)): _*).cast("array<float>")
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("qvec", qlit)
      .withColumn("sim", round(expr("cosine_sim(embedding, qvec)"), 6))
      .drop("qvec")
  }

  /** cluster_search (server.py:191-276): aggregate the top-k hits by
    * (cluster, chat): best similarity, hit count, the best hit's
    * preview as the snippet; rank by (best_similarity, hits) desc —
    * the reference's exact ordering, with (group_id, source) as the
    * deterministic tie-break the reference leaves to dict order.
    */
  def clusterSearch(spark: SparkSession, dir: String, query: String,
                    topK: Int = 50, maxClusters: Int = 10,
                    similarityThreshold: Double = 0.0): DataFrame =
    clusterAgg(vectorSearch(spark, dir, query, topK, None, similarityThreshold,
      includeClusterContext = false), maxClusters)

  /** cluster_search below the encoder seam (vectorSearchById's
    * contract) — q81b's oracle-expressible serving leg.
    */
  def clusterSearchById(spark: SparkSession, dir: String, vecId: Long,
                        topK: Int = 50, maxClusters: Int = 10,
                        similarityThreshold: Double = 0.0): DataFrame =
    clusterAgg(vectorSearchById(spark, dir, vecId, topK, None, similarityThreshold,
      includeClusterContext = false), maxClusters)

  private def clusterAgg(hitsRaw: DataFrame, maxClusters: Int): DataFrame = {
    require(maxClusters > 0 && maxClusters <= 1000, "max_clusters must be in the range 1..1000")
    val hits = hitsRaw
      .filter(col("group_id").isNotNull) // the reference skips cluster_id < 0
    hits
      .groupBy(col("group_id"), col("source"))
      .agg(
        max(col("sim")).as("best_similarity"),
        count(lit(1)).as("hits"),
        // snippet of the MOST similar member; vec_id tie-break
        max(struct(col("sim"), -col("vec_id"), col("preview"))).getField("preview").as("snippet"))
      .orderBy(col("best_similarity").desc, col("hits").desc, col("group_id"), col("source"))
      .limit(maxClusters)
  }

  /** get_cluster (server.py:280-328): every member of one (source,
    * group) cluster with its text, in id order — the reference's
    * ORDER BY m.date with this schema's monotone id standing in.
    */
  def getCluster(spark: SparkSession, dir: String, source: String,
                 groupId: Long): DataFrame = {
    // the reference's `chat_id <= 0` ValueError, with source (the
    // chat analog in this schema) as the guarded key
    require(source.nonEmpty, "source must be a non-empty string")
    require(groupId >= 0, "group_id must be >= 0")
    Vectors.semanticGroups(spark, dir)
      .filter(col("source") === source && col("group_id") === groupId)
      .select("doc_id", "source", "group_id")
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text")),
        "doc_id")
      .orderBy("doc_id")
  }

  /** The server's two @mcp.prompt templates (server.py:89-117) —
    * pure string functions an MCP host registers verbatim; replayed
    * here so the full server surface (4 tools + 2 prompts) has a
    * graft counterpart.
    */
  def vectorSearchTemplate(query: String): String =
    "You are assisting with semantic search over Telegram chats.\n" +
      "Use the `vector_search` tool with the provided query to find the most relevant messages.\n" +
      "Provide concise results with chat name, author, date, similarity, and a compact snippet.\n\n" +
      s"Query: $query\n" +
      "Return the top findings and any notable clusters."

  def clusterSummaryTemplate(chatName: String, snippet: String): String =
    "You are summarizing a conversation cluster from a Telegram chat.\n" +
      s"Chat: $chatName\n" +
      "Snippet (ordered by time, `>>>` marks the most relevant message):\n" +
      s"$snippet\n\n" +
      "Write a brief summary covering: topic, participants, and outcome."

  /** get_cluster_summary_data (cluster_analysis_cli.py:339-377): one
    * cluster's messages formatted for LLM summarization — "[date]
    * author: text" lines in time order, empty texts skipped, joined
    * by newlines. This schema's mapping: doc_id is the monotone date
    * stand-in (get_cluster's ordering contract) and source the chat
    * key; there is no author column, so the line is "[doc_id] source:
    * text". The LLM CALL half (summarize_cluster_with_openai) needs
    * an external API and stays out of scope — this is the data side
    * that feeds it, reduced to ONE row on the driver (a cluster is
    * serving-bounded, and ordering is pinned inside the aggregation
    * by array_sort on the id-keyed struct, not by shuffle luck).
    */
  def clusterSummaryData(spark: SparkSession, dir: String, source: String,
                         groupId: Long): String =
    getCluster(spark, dir, source, groupId)
      .filter(length(trim(col("text"))) > 0)
      .select(struct(col("doc_id").as("id"),
        concat(lit("["), col("doc_id"), lit("] "), col("source"), lit(": "),
          trim(col("text"))).as("line")).as("s"))
      .agg(coalesce(array_join(expr("transform(array_sort(collect_list(s)), x -> x.line)"),
        "\n"), lit("")).as("txt"))
      .head.getString(0)

  /** random_large_cluster (server.py:331-370): a "random" cluster of
    * size ≥ minSize. Randomness is SEEDED here (the q59/q82
    * multiplicative-hash arithmetic over the cluster key) — an engine
    * that promises deterministic replays has no business calling
    * rand() at serve time; vary `seed` for a different pick. The
    * arithmetic (BIGINT multiply + mod, ties broken by the full key)
    * is deliberately SQL-expressible so the pick replays verbatim in
    * the DuckDB oracle (q81d) — the earlier Murmur3 spelling was
    * engine-private and kept this one tool outside the hard gate.
    */
  def randomLargeCluster(spark: SparkSession, dir: String,
                         minSize: Int = 10, seed: Long = 42L): DataFrame = {
    require(minSize > 0, "min_size must be > 0")
    val big = Vectors.semanticGroups(spark, dir)
      .groupBy("source", "group_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSize)
    val pick = big
      // group_id pre-masked to 2^31 so the BIGINT product can't
      // overflow on EITHER engine (DuckDB errors rather than wraps;
      // identity for all ids < 2^31) — see Curation.pseudonymize.khash
      .withColumn("hkey",
        pmod(pmod(col("group_id"), lit(2147483648L)) * lit(2654435761L) + lit(seed),
          lit(4294967296L)))
      .orderBy(col("hkey"), col("source"), col("group_id"))
      .limit(1)
      .select(col("source").as("p_source"), col("group_id").as("p_group"))
    Vectors.semanticGroups(spark, dir)
      .join(broadcast(pick),
        col("source") === col("p_source") && col("group_id") === col("p_group"))
      .select("doc_id", "source", "group_id")
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text")),
        "doc_id")
      .orderBy("doc_id")
  }
}

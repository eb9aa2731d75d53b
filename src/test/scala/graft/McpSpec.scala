package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins mcp.McpTools — the serving adapter over q16/q14/q18's
  * operators: each tool's result must be a pure deterministic
  * function of (dir, arguments) and structurally consistent with the
  * operators it delegates to (the adapter adds NO query logic).
  */
class McpSpec extends AnyFunSuite {
  import TestSpark._
  import mcp.McpTools._

  private val q = "what did the harbor fleet do during rough weather"

  test("vector_search: ranked top-k with text, threshold honored, deterministic") {
    val r = vectorSearch(spark, TestSpark.dir, q, topK = 7).collect()
    assert(r.length == 7)
    val sims = r.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "ranked by sim desc")
    assert(r.map(_.getInt(2)).toSeq == (1 to 7), "dense ranks")
    assert(r.forall(x => Option(x.getString(5)).exists(_.nonEmpty)), "every hit carries its preview")
    val r2 = vectorSearch(spark, TestSpark.dir, q, topK = 7).collect()
    assert(r.toSeq == r2.toSeq, "serving must be deterministic in (dir, args)")
    val thr = sims(3)
    val rt = vectorSearch(spark, TestSpark.dir, q, topK = 7, similarityThreshold = thr).collect()
    assert(rt.forall(_.getDouble(1) >= thr), "threshold is a hard floor")
  }

  test("vector_search top-k is TakeOrdered, never a corpus-wide single-task window") {
    val plan = vectorSearch(spark, TestSpark.dir, q, topK = 7,
        includeClusterContext = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"serving top-k must be a distributed orderBy+limit:\n$plan")
  }

  test("vector_search: source filter restricts hits; cluster context joins the group lead") {
    val all = vectorSearch(spark, TestSpark.dir, q, topK = 5).collect()
    val src = all.head.getString(3)
    val filtered = vectorSearch(spark, TestSpark.dir, q, topK = 5, source = Some(src)).collect()
    assert(filtered.nonEmpty && filtered.forall(_.getString(3) == src))
    assert(all.head.schema.fieldNames.contains("cluster_preview"))
    val bare = vectorSearch(spark, TestSpark.dir, q, topK = 5,
      includeClusterContext = false).collect()
    assert(!bare.head.schema.fieldNames.contains("cluster_preview"))
  }

  test("cluster_search aggregates vector_search's own hits (reference aggregation replayed)") {
    val hits = vectorSearch(spark, TestSpark.dir, q, topK = 50,
        includeClusterContext = false)
      .collect().filter(!_.isNullAt(6))
      .map(x => (x.getLong(6), x.getString(3), x.getDouble(1), x.getLong(0)))
    val expect = hits.groupBy(h => (h._1, h._2)).map { case ((g, s), hs) =>
      (g, s, hs.map(_._3).max, hs.length.toLong)
    }.toSeq.sortBy(x => (-x._3, -x._4, x._1, x._2)).take(10)
    val got = clusterSearch(spark, TestSpark.dir, q)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(2), x.getLong(3)))
    assert(got.toSeq == expect, "cluster aggregation must replay the reference rule exactly")
  }

  test("argument validation parity with the reference bounds (server.py ValueErrors)") {
    def bad(f: => Any): Unit = { intercept[IllegalArgumentException](f); () }
    bad(vectorSearch(spark, TestSpark.dir, "   "))          // blank query
    bad(vectorSearch(spark, TestSpark.dir, q, topK = 0))    // top_k 1..1000
    bad(vectorSearch(spark, TestSpark.dir, q, topK = 1001))
    bad(vectorSearch(spark, TestSpark.dir, q, similarityThreshold = -0.1))
    bad(vectorSearch(spark, TestSpark.dir, q, similarityThreshold = 1.0000001))
    bad(clusterSearch(spark, TestSpark.dir, q, maxClusters = 0))
    bad(clusterSearch(spark, TestSpark.dir, q, maxClusters = 1001))
    bad(getCluster(spark, TestSpark.dir, "s", groupId = -1L)) // group_id >= 0
    bad(getCluster(spark, TestSpark.dir, "", groupId = 0L))   // chat key non-empty
    bad(randomLargeCluster(spark, TestSpark.dir, minSize = 0))
    // the BOUNDARIES are legal, exactly as in the reference's range checks
    vectorSearch(spark, TestSpark.dir, q, topK = 1000, similarityThreshold = 1.0).collect()
    clusterSearch(spark, TestSpark.dir, q, maxClusters = 1000).collect()
    randomLargeCluster(spark, TestSpark.dir, minSize = 1).collect()
  }

  test("empty results are empty frames with the full schema, never errors") {
    // threshold 1.0: legal, and nothing cosine-matches the hash
    // encoder's query vector exactly — the reference returns an
    // empty frame with the declared columns (vector_store.py's
    // empty_schema), not an error
    val r = vectorSearch(spark, TestSpark.dir, q, similarityThreshold = 1.0)
    assert(r.columns.toSeq == Seq("vec_id", "sim", "rk", "source", "lang",
      "preview", "group_id", "cluster_preview"))
    assert(r.count() == 0)
    val c = clusterSearch(spark, TestSpark.dir, q, similarityThreshold = 1.0)
    assert(c.columns.toSeq == Seq("group_id", "source", "best_similarity", "hits", "snippet"))
    assert(c.count() == 0)
    val g = getCluster(spark, TestSpark.dir, "no_such_source", 999999L)
    assert(g.columns.toSeq == Seq("doc_id", "source", "group_id", "lang", "text"))
    assert(g.count() == 0)
    // no cluster meets min_size -> empty membership, the reference's
    // `if df_or_none is None: return []`
    assert(randomLargeCluster(spark, TestSpark.dir, minSize = Int.MaxValue).count() == 0)
  }

  test("threshold + limit compose as WHERE-before-LIMIT: count = min(top_k, n_passing)") {
    val all = vectorSearch(spark, TestSpark.dir, q, topK = 1000,
      includeClusterContext = false).collect()
    assert(all.length >= 8, "corpus must give a non-trivial ranking")
    val t = all(5).getDouble(1) // the 6th-best sim
    val n = all.count(_.getDouble(1) >= t)
    // a big limit returns ALL passers…
    val wide = vectorSearch(spark, TestSpark.dir, q, topK = 1000,
      similarityThreshold = t, includeClusterContext = false).collect()
    assert(wide.length == n, "limit must not clip below the passing set")
    // …and a small one fills every slot from the passing set
    val narrow = vectorSearch(spark, TestSpark.dir, q, topK = 4,
      similarityThreshold = t, includeClusterContext = false).collect()
    assert(narrow.length == 4 && narrow.forall(_.getDouble(1) >= t))
  }

  test("source filter restricts BEFORE the limit: per-chat top-k, not global-top-k ∩ chat") {
    val all = vectorSearch(spark, TestSpark.dir, q, topK = 1000,
      includeClusterContext = false).collect()
    // pick a source that does NOT own the global best hit, so the two
    // compositions genuinely differ
    val best = all.head.getString(3)
    val src = all.map(_.getString(3)).find(_ != best).get
    val want = all.filter(_.getString(3) == src).take(3).map(_.getLong(0)).toSeq
    val got = vectorSearch(spark, TestSpark.dir, q, topK = 3, source = Some(src),
      includeClusterContext = false).collect().map(_.getLong(0)).toSeq
    assert(got == want,
      "the chat filter must apply in the WHERE (per-chat ranking), as in the reference SQL")
  }

  test("get_cluster returns exactly the group's members in id order") {
    val g = operators.Vectors.semanticGroups(spark, TestSpark.dir)
      .groupBy("source", "group_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3).orderBy("source", "group_id").head
    val members = getCluster(spark, TestSpark.dir, g.getString(0), g.getLong(1)).collect()
    assert(members.length == g.getLong(2))
    val ids = members.map(_.getLong(0))
    assert(ids.sorted.toSeq == ids.toSeq, "ordered by id (the date stand-in)")
    assert(members.forall(m => !m.isNullAt(3)), "every member carries its text")
  }

  test("prompt templates embed their arguments verbatim (server.py @mcp.prompt parity)") {
    val vt = vectorSearchTemplate("harbor storms")
    assert(vt.contains("Query: harbor storms\n") && vt.contains("`vector_search`"))
    val ct = clusterSummaryTemplate("boat-chat", ">>> the key line")
    assert(ct.contains("Chat: boat-chat\n") && ct.contains(">>> the key line\n\n"))
    assert(ct.endsWith("topic, participants, and outcome."))
  }

  test("cluster summary data: ordered [id] source: text lines, empty texts skipped") {
    val g = operators.Vectors.semanticGroups(spark, TestSpark.dir)
      .groupBy("source", "group_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3).orderBy("source", "group_id").head
    val (src, grp) = (g.getString(0), g.getLong(1))
    val txt = clusterSummaryData(spark, TestSpark.dir, src, grp)
    val want = getCluster(spark, TestSpark.dir, src, grp).collect()
      .filter(r => r.getString(4).trim.nonEmpty)
      .map(r => s"[${r.getLong(0)}] ${r.getString(1)}: ${r.getString(4).trim}")
      .mkString("\n")
    assert(txt == want, "assembly must replay the reference's line format and time order")
    assert(txt.linesIterator.size == g.getLong(2),
      "this fixture has no empty texts, so every member contributes a line")
    // an empty cluster assembles to the empty string, not an error
    assert(clusterSummaryData(spark, TestSpark.dir, "no_such_source", 999999L) == "")
  }

  test("random_large_cluster: seeded pick among eligible groups, full membership, deterministic") {
    val r = randomLargeCluster(spark, TestSpark.dir, minSize = 3).collect()
    assert(r.nonEmpty && r.length >= 3, "the picked cluster meets min_size")
    val (src, grp) = (r.head.getString(1), r.head.getLong(2))
    assert(r.forall(x => x.getString(1) == src && x.getLong(2) == grp), "ONE cluster, fully")
    assert(r.toSeq == randomLargeCluster(spark, TestSpark.dir, minSize = 3).collect().toSeq,
      "same seed, same pick")
    val viaGet = getCluster(spark, TestSpark.dir, src, grp).collect()
    assert(r.map(_.getLong(0)).toSeq == viaGet.map(_.getLong(0)).toSeq,
      "membership agrees with get_cluster")
  }

  test("vectorSearchById: self-hit leads, clusterSearchById aggregates the same hits") {
    // the below-the-encoder serving leg (q81): querying BY a corpus
    // vector must rank that vector itself first at sim 1.0, and the
    // cluster aggregation must be exactly the grouped top-k hits
    val hits = vectorSearchById(spark, TestSpark.dir, vecId = 3L, topK = 8,
      includeClusterContext = false).collect()
    assert(hits.length == 8)
    assert(hits.head.getLong(0) == 3L && hits.head.getDouble(1) == 1.0,
      s"vec 3 must self-hit at rk=1 sim=1.0, got ${hits.head}")
    assert(hits.map(_.getInt(2)).toSeq == (1 to 8), "ranks are dense 1..k")
    val clusters = clusterSearchById(spark, TestSpark.dir, vecId = 3L, topK = 8,
      maxClusters = 100).collect()
    assert(clusters.map(_.getLong(3)).sum == 8L,
      "cluster hit counts partition the top-k hit set")
    val bestByCluster = hits.groupBy(r => (r.getLong(6), r.getString(3)))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).max }
    clusters.foreach { c =>
      assert(bestByCluster((c.getLong(0), c.getString(1))) == c.getDouble(2),
        "best_similarity equals the group's max hit sim")
    }
  }
}

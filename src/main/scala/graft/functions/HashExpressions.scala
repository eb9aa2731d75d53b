package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass hashing expressions for the dedup family (SURVEY.md §2 D).
  *
  * The reference reaches near-dup semantics through embeddings +
  * cosine clustering (vector_store.py); at 100TB-pipeline scale the
  * standard cheap paths are MinHash-LSH / SimHash over shingles.
  * These are single-pass expressions instead of k-fold explode/agg
  * plans: one row in, one signature out, no shuffle amplification.
  *
  * Engine-internal by design (hash bit patterns are not part of the
  * result contract); candidate pairs they generate are verified with
  * exact Jaccard before surfacing.
  */
object Hashing {
  /** FNV-1a 64-bit over UTF-8 bytes — stable, allocation-free.
    * (Public + stable-named: generated code calls these statically.)
    */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }
  /** splitmix64 finalizer — decorrelates per-permutation seeds. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic random-hyperplane components for sign-LSH
    * (SignBits): plane b, dim d ∈ [-1, 1) via splitmix64. Cached per
    * (nBits, dim) so per-row evaluation is pure multiply-adds; the
    * method is static-forwarded for generated code.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  def planes(nBits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nBits, dim), _ =>
      Array.tabulate(nBits, dim) { (b, d) =>
        val h = mix64((b.toLong << 32) ^ d.toLong ^ 0x5eedL)
        (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      })
}

/** MinHash signature (k permutations) over an ARRAY<STRING> of
  * shingles → ARRAY<BIGINT>. Permutation i's hash of shingle s is
  * mix64(fnv1a64(s) ^ seed_i); the signature element is the min.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash expects ARRAY<STRING>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // null elements are SKIPPED, not dereferenced: the type check
      // accepts containsNull arrays (any user SQL array is one), and
      // an NPE inside a task is the worst possible spelling of
      // "null is not a shingle". Both modes agree (codegen below).
      val s = arr.getUTF8String(i)
      if (s != null) {
        val base = Hashing.fnv1a64(s.getBytes)
        var j = 0
        while (j < k) {
          val h = Hashing.mix64(base ^ (j * 0x9e3779b97f4a7c15L))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // static forwarders on the mirror class — `Hashing.MODULE$` does
      // not exist (MODULE$ lives on Hashing$), and a bad reference here
      // silently demotes the whole stage to the interpreted path
      val hashing = Hashing.getClass.getName.stripSuffix("$")
      val sig = ctx.freshName("sig"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val base = ctx.freshName("base"); val h = ctx.freshName("h")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if ($c.isNullAt($i)) continue; // null element = not a shingle
         |  long $base = $hashing.fnv1a64($c.getUTF8String($i).getBytes());
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $h = $hashing.mix64($base ^ ($j * -7046029254386353131L));
         |    if ($h < $sig[$j]) $sig[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an ARRAY<STRING> of shingles → BIGINT.
  * Classic Charikar sketch: per-bit vote of each shingle's hash,
  * sign of the vote becomes the output bit. Near-dups have small
  * Hamming distance.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"simhash expects ARRAY<STRING>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i) // null element = not a shingle (see minhash)
      if (s != null) {
        val h = Hashing.mix64(Hashing.fnv1a64(s.getBytes))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // static forwarders on the mirror class — `Hashing.MODULE$` does
      // not exist (MODULE$ lives on Hashing$), and a bad reference here
      // silently demotes the whole stage to the interpreted path
      val hashing = Hashing.getClass.getName.stripSuffix("$")
      val votes = ctx.freshName("votes"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if ($c.isNullAt($i)) continue; // null element = not a shingle
         |  long $h = $hashing.mix64($hashing.fnv1a64($c.getUTF8String($i).getBytes()));
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($votes[$b] > 0) $out |= (1L << $b); }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct, lexicographically sorted bigram shingles of a STRING →
  * ARRAY<STRING>, in ONE codegen-able pass.
  *
  * Semantically identical to
  *   array_sort(array_distinct(transform(sequence(1, n-1),
  *     i -> concat(tok[i], ' ', tok[i+1]))))
  * over split(text, ' ') — but that pipeline is a higher-order-
  * function chain (interpreted, breaks whole-stage codegen) and its
  * Generate consumers paid a measured ~2s/5000-doc boundary tax at
  * sf0.1. Tokenization calls the same UTF8String.split(" ", -1) that
  * Spark's StringSplit uses, so token parity with the split() twin
  * (and the DuckDB oracle's string_split) is exact; ordering is
  * UTF8String's binary compareTo — the same ordering array_sort uses
  * for strings. Degenerate inputs (< 2 tokens) yield an EMPTY array.
  */
case class BigramShingles(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"shingles expects STRING, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any =
    BigramShingles.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = BigramShingles.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramShingles {
  private val SPACE = UTF8String.fromString(" ")

  /** Static so generated code can call it (see Hashing note above). */
  def compute(text: UTF8String): GenericArrayData = {
    val toks = text.split(SPACE, -1)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < toks.length - 1) {
      set.add(UTF8String.concat(toks(i), SPACE, toks(i + 1)))
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Ordered, NON-distinct k-token grams of a STRING → ARRAY<STRING>,
  * one codegen-able pass (the k-generalization of BigramShingles,
  * which is distinct+sorted for set-similarity; span-level dedup
  * needs every POSITION's gram in order so coverage spans can be
  * reconstructed). Tokenization is the ShinglesParitySpec-pinned
  * UTF8String.split contract; inputs with fewer than k tokens yield
  * an EMPTY array (mirrors the declarative sequence() guard).
  */
case class KGrams(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"kgrams needs k >= 1, got $k")
    case other      => TypeCheckResult.TypeCheckFailure(s"kgrams expects STRING, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kgrams"

  override protected def nullSafeEval(input: Any): Any =
    KGrams.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = KGrams.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($c, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KGrams {
  private val SPACE = UTF8String.fromString(" ")

  /** Static so generated code can call it (see Hashing note above). */
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      var g = toks(i)
      var j = 1
      while (j < k) { g = UTF8String.concat(g, SPACE, toks(i + j)); j += 1 }
      out(i) = g
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** 64-bit hashes of the ordered k-token grams of a STRING →
  * ARRAY<BIGINT>: element i is exactly fnv1a64 of the UTF-8 bytes of
  * kgrams(text, k)[i] (KGramHashParitySpec pins that law), computed
  * WITHOUT materializing the gram strings.
  *
  * This is the shuffle-bytes spelling of KGrams for blocking keys
  * (q64): an 8-token gram string averages ~50 bytes and rides the
  * gram-frequency shuffle AND the semi-join shuffle — ~8× the corpus
  * text, twice. The 8-byte hash carries the same grouping information
  * (collisions at ~n²/2⁶⁴ merge two grams into one block — at 10¹²
  * grams that's odds-on ONE spurious shared gram corpus-wide, noise
  * for a coverage FRACTION; any exact-span consumer re-verifies
  * strings per candidate anyway).
  */
case class KGramHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"kgram_hashes needs k >= 1, got $k")
    case other      => TypeCheckResult.TypeCheckFailure(s"kgram_hashes expects STRING, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kgram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    KGramHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = KGramHashes.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($c, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KGramHashes {
  private val SPACE = UTF8String.fromString(" ")

  /** Static so generated code can call it (see Hashing note above).
    * FNV-1a is byte-sequential, so feeding token bytes interleaved
    * with the 0x20 separator reproduces fnv1a64 of the concatenated
    * gram exactly — no UTF8String.concat allocations in the loop.
    */
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val toks = text.split(SPACE, -1)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val tokBytes = new Array[Array[Byte]](toks.length)
    var t = 0
    while (t < toks.length) { tokBytes(t) = toks(t).getBytes; t += 1 }
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) {
        if (j > 0) { h ^= 0x20L; h *= 0x100000001b3L }
        val b = tokBytes(i + j)
        var p = 0
        while (p < b.length) { h ^= (b(p) & 0xffL); h *= 0x100000001b3L; p += 1 }
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All five intra-document repetition counters of a STRING in ONE
  * codegen-able pass → STRUCT<n_words INT, n_uniq_words INT,
  * n_bigrams INT, n_uniq_bigrams INT, top_bigram_cnt BIGINT>.
  *
  * Semantically identical to the declarative spelling over
  * split(text, ' '): size(toks), size(array_distinct(toks)),
  * size(bigrams), size(array_distinct(bigrams)), and the max
  * per-doc bigram multiplicity — but that spelling needs an
  * interpreted HOF chain to build bigrams plus an explode + two-level
  * aggregation (a full shuffle) for the per-doc bigram mode, for a
  * value that is a pure per-row function of the text (VERDICT r06:
  * 6.1s for 5k docs; should be sub-second). Tokenization is the same
  * UTF8String.split(" ", -1) whose parity with split()/string_split
  * is pinned by ShinglesParitySpec; degenerate inputs (< 2 tokens)
  * yield zero bigram counters, matching the declarative guard.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"repetition_stats expects STRING, got $other")
  }
  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = RepetitionStats.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  private val SPACE = UTF8String.fromString(" ")

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_uniq_words", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_uniq_bigrams", IntegerType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false)))

  /** Static so generated code can call it (see Hashing note above). */
  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.split(SPACE, -1)
    val n = toks.length
    val words = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    var i = 0
    while (i < n) { words.add(toks(i)); i += 1 }
    var uniqBi = 0
    var topCnt = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
      i = 0
      while (i < n - 1) {
        val bg = UTF8String.concat(toks(i), SPACE, toks(i + 1))
        val c = counts.merge(bg, 1, (a, b) => a + b)
        if (c > topCnt) topCnt = c.longValue()
        i += 1
      }
      uniqBi = counts.size()
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, words.size(), math.max(n - 1, 0), uniqBi, topCnt))
  }
}

/** 64-bit polynomial rolling-hash fingerprint of a STRING → BIGINT
  * (document fingerprinting for the text-analysis family; the
  * reference's per-message identity is (message_id, chat_id) —
  * content fingerprints are the content-addressed equivalent).
  */
case class Fingerprint64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other      => TypeCheckResult.TypeCheckFailure(s"fingerprint64 expects STRING, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes"); val h = ctx.freshName("h"); val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $bytes.length; $i++) { $h = $h * 31L + ($bytes[$i] & 0xffL); }
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hash-sketch operators.
  *
  * Why custom expressions (SURVEY.md §7.1 note 6 seam): the same sketches
  * written with built-in higher-order functions (transform/aggregate) are
  * evaluated interpretively per array element, and a k-hash signature
  * re-hashes every string k times — measured 21 s for MinHash over a 5,000
  * doc table at sf0.1. A single `nullSafeEval` running the whole primitive
  * loop in compiled code hashes each element once and does the k affine
  * transforms on longs, which is the preference-order (b) design: custom
  * scalar Expression before any UDF.
  *
  * Hashing: the positional-gram/byte sketches use Spark's own XXH64
  * (seed 42, identical to the builtin `xxhash64`); the MinHash/SimHash
  * sketches use ENGINE-PORTABLE polynomial digests (mod-2^31-1 char
  * folds, the same arithmetic as [[WinnowedFingerprints]]) so a DuckDB
  * oracle can replicate the full signature bit-for-bit — that is what
  * upgrades q24/q25 from rows-only checks to hard oracle gates.
  */
object HashExprs {

  /** Signature element domain: 2^31 - 1 (Mersenne prime). Products a*x stay
    * below 2^62, so 64-bit arithmetic is exact.
    */
  val MinhashPrime: Long = 2147483647L

  /** Portable polynomial char digest: fold h = (h*mult + char) mod 2^31-1
    * over UTF-16 units (== code points for BMP text; fixtures/corpora are
    * ASCII). Replicated in SQL as
    * `list_reduce([unicode(s[j]) ...], (a,b) -> (a*mult + b) % 2147483647)`
    * — the q56 winnowing idiom. Empty input digests to 0.
    */
  def polyDigest(s: org.apache.spark.unsafe.types.UTF8String, mult: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) { h = (h * mult + str.charAt(i)) % MinhashPrime; i += 1 }
    h
  }

  /** Both portable digests (mult 257 and 263) in ONE pass, without the
    * per-call String allocation: ASCII bytes fold directly (a UTF-8 byte
    * < 0x80 IS its UTF-16 unit, so the fold is bit-identical to
    * [[polyDigest]]); the first non-ASCII byte falls back to the decoded
    * UTF-16 path. The sketch expressions call this once per token — on an
    * ASCII corpus that removes two String decodes + one char pass per
    * token from the 100 TB hot path while keeping every signature value
    * byte-identical to the SQL oracle replica (PropertySpec pins
    * polyDigestPair == (polyDigest 257, polyDigest 263)).
    *
    * @param out out(0)=digest(257), out(1)=digest(263)
    */
  def polyDigestPair(s: org.apache.spark.unsafe.types.UTF8String, out: Array[Long]): Unit = {
    val n = s.numBytes()
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b < 0) { // non-ASCII: redo via the UTF-16 decode for correctness
        val str = s.toString
        h1 = 0L; h2 = 0L
        var j = 0
        while (j < str.length) {
          val c = str.charAt(j)
          h1 = (h1 * 257L + c) % MinhashPrime
          h2 = (h2 * 263L + c) % MinhashPrime
          j += 1
        }
        out(0) = h1; out(1) = h2
        return
      }
      h1 = (h1 * 257L + b) % MinhashPrime
      h2 = (h2 * 263L + b) % MinhashPrime
      i += 1
    }
    out(0) = h1
    out(1) = h2
  }

  /** The 64-member portable hash family over a (h1, h2) digest pair:
    * f_i = ((2i+3)*h1 + (7i^2+11)*h2 + 31i+7) mod p. Two strings collide
    * for EVERY i only if both digests collide (the i-polynomial has >2
    * distinct coefficient points), so the family's effective codomain is
    * ~62 bits even though each member is 31-bit. Coefficients are small
    * ints: every product stays far below 2^62 (exact, ANSI-safe, and
    * exactly writable in DuckDB integer arithmetic).
    */
  def familyHash(i: Int, h1: Long, h2: Long): Long =
    Math.floorMod(
      (2L * i + 3L) * h1 + (7L * i * i + 11L) * h2 + 31L * i + 7L,
      MinhashPrime)

  /** MinHash signature of an array<string> token/shingle set:
    * sig(i) = min over tokens of familyHash(i, poly257(tok), poly263(tok)).
    * Empty input yields an all-sentinel (p) signature; null and empty
    * elements are skipped (matches WordShingles, and keeps the SQL
    * replica's char fold total).
    *
    * Portability over raw hash width: the two 31-bit polynomial digests
    * give a ~62-bit effective codomain (see familyHash), and any residual
    * digest collision can only ADD an LSH candidate — candidates are
    * always re-verified by exact Jaccard, so collisions cost work, never
    * correctness.
    */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"minhash_sig requires array<string>, got $other")
      }
    override def prettyName: String = "minhash_sig"

    private val p = MinhashPrime

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }

    def compute(arr: ArrayData): ArrayData = {
      val n = arr.numElements()
      val h1s = new Array[Long](n)
      val h2s = new Array[Long](n)
      val pair = new Array[Long](2)
      var cnt = 0 // null/empty elements are skipped (matches WordShingles)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null && s.numBytes() > 0) {
          polyDigestPair(s, pair)
          h1s(cnt) = pair(0)
          h2s(cnt) = pair(1)
          cnt += 1
        }
        i += 1
      }
      val sig = new Array[Long](numHashes)
      var k = 0
      while (k < numHashes) {
        var m = p // sentinel for empty sets; real values are < p
        i = 0
        while (i < cnt) {
          val v = familyHash(k, h1s(i), h2s(i))
          if (v < m) m = v
          i += 1
        }
        sig(k) = m
        k += 1
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit SimHash of an array<string> token multiset: bit j of the result
    * is set iff Σ_tokens (familyHash(j, poly257(tok), poly263(tok)) odd
    * ? +1 : -1) > 0. The per-token bit stream comes from the parity of the
    * portable 64-member hash family instead of raw xxhash64 bits — mod-p
    * values are odd with probability (p-1)/2p (bias 1/2p ≈ 2^-32,
    * immaterial), and the whole fingerprint becomes exactly replicable in
    * DuckDB SQL (the q25 oracle brute-forces the complete Hamming
    * relation from it). Null and empty tokens are skipped.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"simhash64 requires array<string>, got $other")
      }
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simhash64", this, classOf[SimHash64].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }

    def compute(arr: ArrayData): Long = {
      val n = arr.numElements()
      val votes = new Array[Int](64)
      val pair = new Array[Long](2)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null && s.numBytes() > 0) { // skip null/empty (matches WordShingles)
          polyDigestPair(s, pair)
          val h1 = pair(0)
          val h2 = pair(1)
          var j = 0
          while (j < 64) {
            if ((familyHash(j, h1, h2) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var fp = 0L
      var j = 0
      while (j < 64) {
        if (votes(j) > 0) fp |= (1L << j)
        j += 1
      }
      fp
    }

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Distinct word n-gram shingles of an array<string> token sequence,
    * joined by a single space, first-occurrence order, empty tokens
    * skipped. n <= 1 yields the distinct token set. Primitive-loop
    * replacement for the transform/slice/concat_ws formulation.
    */
  case class WordShingles(child: Expression, n: Int,
      distinctOut: Boolean = true)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"word_shingles requires array<string>, got $other")
      }
    override def prettyName: String = "word_shingles"

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }

    def compute(arr: ArrayData): ArrayData = {
      val toks = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
      var i = 0
      while (i < arr.numElements()) {
        val t = arr.getUTF8String(i)
        if (t != null && t.numBytes() > 0) toks.add(t)
        i += 1
      }
      val m = toks.size()
      // distinctOut=true: first-occurrence-ordered set (dedup semantics);
      // false: every positional n-gram, duplicates kept (repetition
      // metrics need the multiset)
      val seen: java.util.Collection[org.apache.spark.unsafe.types.UTF8String] =
        if (distinctOut)
          new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
        else new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
      if (n <= 1) {
        i = 0
        while (i < m) { seen.add(toks.get(i)); i += 1 }
      } else {
        val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
        i = 0
        while (i + n <= m) {
          val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = toks.get(i + j); j += 1 }
          seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
          i += 1
        }
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    }

    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)
  }

  /** Winnowed document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * local fingerprinting algorithm): positional word k-grams are hashed
    * with a polynomial rolling hash over code points
    * (h = fold (h*257 + cp) mod 2^31-1, spaces included between words —
    * deliberately engine-portable arithmetic, replicated verbatim by the
    * DuckDB oracle), then each window of `w` consecutive gram hashes
    * contributes its minimum. Returns the SORTED DISTINCT minima as
    * array<long>. Winnowing's guarantee: any shared token run of length
    * >= k + w - 1 between two documents yields at least one shared
    * fingerprint, while only ~2/(w+1) of gram hashes are kept — the
    * containment-detection sketch that scales to corpus-level matching
    * (join on fingerprint value) without shipping token sets.
    *
    * Fewer than k tokens -> empty; fewer than w gram hashes -> the single
    * global minimum.
    */
  case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"winnow_fingerprints requires array<string>, got $other")
      }
    override def prettyName: String = "winnow_fingerprints"

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("winnowFp", this, classOf[WinnowedFingerprints].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }

    private val p = MinhashPrime

    def compute(arr: ArrayData): ArrayData = {
      val toks = new java.util.ArrayList[String]()
      var i = 0
      while (i < arr.numElements()) {
        val t = arr.getUTF8String(i)
        if (t != null && t.numBytes() > 0) toks.add(t.toString)
        i += 1
      }
      val m = toks.size()
      val nGrams = m - k + 1
      if (nGrams <= 0) return new GenericArrayData(Array.empty[Long])
      val hs = new Array[Long](nGrams)
      i = 0
      while (i < nGrams) {
        var h = 0L
        var j = 0
        while (j < k) {
          if (j > 0) h = (h * 257 + ' '.toInt) % p
          val s = toks.get(i + j)
          var ci = 0
          while (ci < s.length) {
            val cp = s.codePointAt(ci)
            h = (h * 257 + cp) % p
            ci += Character.charCount(cp)
          }
          j += 1
        }
        hs(i) = h
        i += 1
      }
      val winLen = math.min(w, nGrams)
      val nWin = nGrams - winLen + 1
      val mins = new Array[Long](nWin)
      i = 0
      while (i < nWin) {
        var mn = hs(i)
        var j = 1
        while (j < winLen) { if (hs(i + j) < mn) mn = hs(i + j); j += 1 }
        mins(i) = mn
        i += 1
      }
      java.util.Arrays.sort(mins)
      var wr = 0
      i = 0
      while (i < nWin) {
        if (wr == 0 || mins(i) != mins(wr - 1)) { mins(wr) = mins(i); wr += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(mins, wr))
    }

    override protected def withNewChildInternal(newChild: Expression): WinnowedFingerprints =
      copy(child = newChild)
  }

  /** Hash each string of an array<string> to a long (XXH64 mod 2^61, always
    * non-negative) and return the SORTED distinct array — the compact
    * set representation for pairwise set operations at scale: long arrays
    * merge-compare without per-pair hashing or allocation.
    */
  case class HashedSortedSet(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"hashed_sorted_set requires array<string>, got $other")
      }
    override def prettyName: String = "hashed_sorted_set"

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hashedSortedSet", this, classOf[HashedSortedSet].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }

    def compute(arr: ArrayData): ArrayData = {
      val n = arr.numElements()
      val hs = new Array[Long](n)
      var cnt = 0 // null elements are skipped (matches WordShingles)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null) {
          hs(cnt) = XXH64.hashUTF8String(s, 42L) >>> 3
          cnt += 1
        }
        i += 1
      }
      java.util.Arrays.sort(hs, 0, cnt)
      // dedup in place (input may carry duplicates)
      var w = 0
      i = 0
      while (i < cnt) {
        if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(hs, w))
    }

    override protected def withNewChildInternal(newChild: Expression): HashedSortedSet =
      copy(child = newChild)
  }

  /** Intersection size of two SORTED long arrays — one merge pass, zero
    * allocation. Union size follows as |A| + |B| - |A∩B|. Generates its
    * merge loop into whole-stage codegen (no interpreted boundary on the
    * per-pair verification hot path).
    */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = IntegerType

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val cnt = ctx.freshName("cnt")
        s"""
           |int $na = $a.numElements();
           |int $nb = $b.numElements();
           |int $i = 0; int $j = 0; int $cnt = 0;
           |while ($i < $na && $j < $nb) {
           |  long $x = $a.getLong($i);
           |  long $y = $b.getLong($j);
           |  if ($x == $y) { $cnt++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
           |}
           |${ev.value} = $cnt;
         """.stripMargin
      })
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"sorted_intersect_size requires two array<long>, got $other")
      }
    override def prettyName: String = "sorted_intersect_size"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements(); val nb = b.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      c
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectSize =
      copy(left = newLeft, right = newRight)
  }

  // Column-level API

  def minhashSig(tokens: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(tokens), numHashes))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def wordShingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(
      WordShingles(ColumnBridge.expression(tokens), n))

  /** Positional n-grams with duplicates kept (the multiset form the
    * repetition metrics need; `wordShingles` is the distinct-set form).
    */
  def wordNgrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(
      WordShingles(ColumnBridge.expression(tokens), n, distinctOut = false))

  def hashedSortedSet(strings: Column): Column =
    ColumnBridge.column(HashedSortedSet(ColumnBridge.expression(strings)))

  /** All k-gram hashes of a token array, by position, via a TRUE rolling
    * polynomial: token hashes t_i = xxhash64(tok_i, seed 42), gram hash
    * g_i = Σ_j t_{i+j} · B^{k-1-j} in the 2^64 ring (B = the FNV-64
    * prime, odd, so multiplication is invertible mod 2^64 and the ring
    * arithmetic is exact modular arithmetic on wrapping longs). Each
    * step removes the leading token with one multiply-subtract
    * (precomputed B^{k-1}) and appends the next with one multiply-add:
    * O(n) total vs the O(n·k) per-gram recompute of the md5-of-string
    * formulation — the constant-factor upgrade [[graft.operators.Dedup.spanDedupFast]]
    * rides. 64-bit codomain keeps corpus-scale collision mass negligible
    * (2^31 codomains collide constantly at 10^12 grams).
    *
    * Input must already be filtered of empty tokens — the expression
    * hashes positions as given so output index i always refers to the
    * caller's token i (filtering inside would silently desync the
    * rewrite). Returns empty array when fewer than k tokens.
    */
  case class PositionalGramHashes(child: Expression, k: Int)
      extends UnaryExpression {
    require(k >= 1, s"k must be >= 1, got $k")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"positional_gram_hashes requires array<string>, got $other")
      }
    override def prettyName: String = "positional_gram_hashes"

    override protected def withNewChildInternal(newChild: Expression): PositionalGramHashes =
      copy(child = newChild)

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("posGrams", this, classOf[PositionalGramHashes].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }

    private val B = 1099511628211L // FNV-64 prime

    def compute(arr: ArrayData): ArrayData = {
      val m = arr.numElements()
      val nGrams = m - k + 1
      if (nGrams <= 0) return new GenericArrayData(Array.empty[Long])
      val th = new Array[Long](m)
      var i = 0
      while (i < m) {
        val s = arr.getUTF8String(i)
        th(i) = if (s == null) 0L else XXH64.hashUTF8String(s, 42L)
        i += 1
      }
      // B^(k-1) in the 2^64 ring (wrapping long multiply IS mod 2^64)
      var bk1 = 1L
      i = 1
      while (i < k) { bk1 *= B; i += 1 }
      val hs = new Array[Long](nGrams)
      var h = 0L
      i = 0
      while (i < k) { h = h * B + th(i); i += 1 }
      hs(0) = h
      i = 1
      while (i < nGrams) {
        h = (h - th(i - 1) * bk1) * B + th(i + k - 1)
        hs(i) = h
        i += 1
      }
      new GenericArrayData(hs)
    }
  }

  def positionalGramHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(
      PositionalGramHashes(ColumnBridge.expression(tokens), k))

  def winnowedFingerprints(tokens: Column, k: Int, w: Int): Column =
    ColumnBridge.column(
      WinnowedFingerprints(ColumnBridge.expression(tokens), k, w))

  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

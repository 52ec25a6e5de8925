package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge, FloatArrayBinaryInputs}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native Catalyst expression for cosine similarity over `array<float>`.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions evaluate their
  * lambdas interpreted (outside WholeStageCodegen), which measured ~2× slower
  * on the candidate-verification stage of embedding dedup at sf0.1. This
  * expression emits a tight fused Java loop via `doGenCode`, keeping the
  * whole stage codegen'd.
  *
  * Numeric contract: SEQUENTIAL accumulation of dot/norms in doubles over
  * float-cast elements — bit-identical to the `aggregate` fold it replaces
  * and to the DuckDB `list_reduce` oracle (verified in DuckdbParitySpec and
  * by the dedup_embedding / ann_topk oracle queries).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayBinaryInputs {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.getFloat($i);
          double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Int8 scalar quantization of a float vector: each component mapped to
  * `floor(x * 127 / maxabs + 0.5)` (round-half-up in one double expression),
  * where `maxabs` is the vector's own max |component| — the per-vector-scale
  * symmetric quantizer production vector stores use to cut index memory 4×
  * (float32 → int8) while keeping relative component structure. An all-zero
  * vector quantizes to all zeros.
  *
  * Downstream scoring over the quantized codes is EXACT INTEGER arithmetic
  * (IntDotExpr), so quantized similarity is order-independent and hash-exact
  * by construction — no float-fold portability contract needed.
  */
case class QuantizeInt8Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.graftbridge.FloatArrayUnaryInput {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
  override def prettyName: String = "quantize_int8"

  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > maxabs) maxabs = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxabs > 0.0) {
      i = 0
      while (i < n) {
        // one left-assoc double expression, mirrored verbatim in the oracle
        out(i) = math.floor(v.getFloat(i).toDouble * 127.0 / maxabs + 0.5).toByte
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("quantizeInt8", this, classOf[QuantizeInt8Expr].getName)
    defineCodeGen(ctx, ev, v => s"$self.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact integer dot product of two int8 code vectors (array<tinyint> →
  * bigint) as a fused codegen loop. Every product is ≤ 127² and the sum over
  * any realistic dimensionality is far inside long range, so the result is
  * EXACT — identical under any evaluation order, partitioning, or engine.
  * This is the hot scoring loop of quantized ANN; `IntDotExpr(q, q)` doubles
  * as the exact squared norm.
  */
case class IntDotExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.graftbridge.ByteArrayBinaryInputs {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        long $dot = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $dot += (long) $a.getByte($i) * (long) $b.getByte($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All multi-band random-hyperplane sign buckets of a float vector in one
  * pass: returns `array<int>` of length `bands`, where element b is the
  * sign-pattern bucket of planes [b*planesPerBand, (b+1)*planesPerBand).
  *
  * The ±1 plane matrix (md5-derived via Similarity.planeSign, shared with
  * the DuckDB oracle generator) rides along as a reference object — versus
  * inlining bands×planes×dims literal terms into the expression tree, whose
  * janino compilation alone cost ~6s per query at any scale factor.
  */
case class SignBucketsExpr(child: Expression, bands: Int, planesPerBand: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  /** Flattened [plane][dim] ±1 matrix. */
  lazy val signs: Array[Double] = {
    val n = bands * planesPerBand
    val m = new Array[Double](n * dims)
    var p = 0
    while (p < n) {
      var i = 0
      while (i < dims) {
        m(p * dims + i) = graft.pipeline.Similarity.planeSign(p, i)
        i += 1
      }
      p += 1
    }
    m
  }

  def compute(v: ArrayData): ArrayData = {
    val n = math.min(dims, v.numElements())
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0
      var p = 0
      while (p < planesPerBand) {
        val plane = b * planesPerBand + p
        var proj = 0.0
        var i = 0
        while (i < n) {
          proj += v.getFloat(i).toDouble * signs(plane * dims + i)
          i += 1
        }
        if (proj >= 0) bucket |= (1 << p)
        p += 1
      }
      out(b) = bucket
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signBuckets", this, classOf[SignBucketsExpr].getName)
    defineCodeGen(ctx, ev, v => s"$self.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit SimHash over a token array in one pass: per token, the first 15
  * hex chars of md5 (= top 60 bits of the digest) vote ±1 on each bit lane;
  * the majority sign pattern is the fingerprint.
  *
  * Bit-identical to the builtin-expression formulation in `Dedup.simhash`
  * (pinned by test) and to the DuckDB oracle, but evaluates each token's
  * digest ONCE in a fused loop — the HOF form re-folds the token array per
  * lane (60 interpreted-lambda passes/row).
  */
case class SimHashExpr(child: Expression, bits: Int = 60)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash"

  /** Returns null (like the builtin-fold twin, where a null token nulls the
    * whole fold) when any array element is null.
    */
  def compute(toks: ArrayData): java.lang.Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val tallies = new Array[Int](bits)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      val s = toks.getUTF8String(t)
      if (s == null) return null
      val d = md.digest(s.getBytes)
      // first 15 hex chars = top 60 bits of the first 8 bytes
      var hv = 0L
      var i = 0
      while (i < 8) { hv = (hv << 8) | (d(i) & 0xffL); i += 1 }
      hv = hv >>> 4
      var b = 0
      while (b < bits) {
        tallies(b) += ((hv >>> b) & 1L).toInt
        b += 1
      }
      md.reset()
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (2 * tallies(b) > n) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhash", this, classOf[SimHashExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      java.lang.Long r = $self.compute($v);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram shingles of a token array in one pass: ["a","b","c","d"], n=3
  * → ["a b c", "b c d"]; fewer than n tokens → empty array. Output strings
  * are identical to `concat_ws(" ", ...)` over `transform(sequence(...))`
  * (the builtin twin kept in Dedup.shinglesFold) but built in a fused loop —
  * the HOF form's lambdas evaluate interpreted on every dedup hot path.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "shingles"

  def compute(toks: ArrayData): ArrayData = {
    val cnt = toks.numElements()
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](math.max(0, cnt - n + 1))
    var i = 0
    while (i + n <= cnt) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      var first = true
      while (j < n) {
        val s = toks.getUTF8String(i + j)
        // null tokens are skipped along with their separator — identical to
        // concat_ws, so the fold twin (Dedup.shinglesFold) agrees even for
        // caller-supplied token arrays containing nulls (unreachable via
        // split(), but both are public API)
        if (s != null) {
          if (!first) sb.append(' ')
          sb.append(s.toString)
          first = false
        }
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingles", this, classOf[ShinglesExpr].getName)
    defineCodeGen(ctx, ev, v => s"$self.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-PQ-centroid code: argmin over a per-subspace codebook array of
  * exact squared-L2 distances between fixed-point long vectors, ties to the
  * FIRST entry (the codebook array is sorted by code, so ties go to the
  * smallest code — the Pq training/encoding contract).
  *
  * Why not `aggregate(...)` with a struct accumulator: PQ encoding runs this
  * argmin once per (corpus row × subspace) against K centroids — the index-
  * build hot loop — and higher-order functions evaluate interpreted. This is
  * the same fused-loop upgrade IntDotExpr applies to quantized scoring; the
  * numeric contract (exact longs, strict `<`) is identical to the fold, so
  * results are bit-equal (spec-pinned).
  */
case class PqArgminExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.graftbridge.PqArgminInputs {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_argmin"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sv = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    var best = Long.MaxValue
    var bestCode = Int.MaxValue
    var i = 0
    while (i < cb.numElements()) {
      val st = cb.getStruct(i, 2)
      val code = st.getInt(0)
      val cent = st.getArray(1)
      val n = math.min(sv.numElements(), cent.numElements())
      var d = 0L
      var j = 0
      while (j < n) {
        val t = sv.getLong(j) - cent.getLong(j)
        d += t * t
        j += 1
      }
      if (d < best) { best = d; bestCode = code }
      i += 1
    }
    bestCode
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestCode = ctx.freshName("bestCode")
      val st = ctx.freshName("st")
      val code = ctx.freshName("code")
      val cent = ctx.freshName("cent")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
        long $best = Long.MAX_VALUE;
        int $bestCode = Integer.MAX_VALUE;
        for (int $i = 0; $i < $b.numElements(); $i++) {
          InternalRow $st = $b.getStruct($i, 2);
          int $code = $st.getInt(0);
          ArrayData $cent = $st.getArray(1);
          int $n = Math.min($a.numElements(), $cent.numElements());
          long $d = 0L;
          for (int $j = 0; $j < $n; $j++) {
            long $t = $a.getLong($j) - $cent.getLong($j);
            $d += $t * $t;
          }
          if ($d < $best) { $best = $d; $bestCode = $code; }
        }
        ${ev.value} = $bestCode;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MOSS winnowing selection over a gram array in ONE fused pass: md5 each
  * gram, slide a `w`-hash window, select each window's minimum taking the
  * RIGHTMOST position on ties, emit the distinct selections in position
  * order as array<struct<pos:int, fp:string>>.
  *
  * Why not the builtin-HOF form (transform(sequence) → slice → array_min →
  * an index fold per window): that shape is O(grams·w) with a lambda
  * evaluated interpreted per window and three array allocations each —
  * measured ~4.9 s for 5000 docs at sf0.1, i.e. ~1 ms/doc on ≤100-token
  * docs. This expression hashes each gram ONCE and runs the classic
  * monotonic-deque sliding-window minimum (pop-back on `>=` makes ties
  * resolve to the rightmost, exactly the MOSS rule), O(grams) total.
  * Selections repeat only consecutively as the window slides, so distinct =
  * skip-if-same-as-last. The HOF twin is kept as TextAnalysis.winnowFold and
  * spec-pinned equal on real docs.
  */
case class WinnowExpr(child: Expression, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(w >= 1)

  private val structType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("pos", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("fp",
      org.apache.spark.sql.types.StringType, nullable = false)))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(structType, containsNull = false)
  override def prettyName: String = "winnow"

  def compute(grams: ArrayData): ArrayData = {
    val n = grams.numElements()
    if (n == 0)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array.empty[org.apache.spark.sql.catalyst.InternalRow])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = "0123456789abcdef".toCharArray
    val hs = new Array[String](n)
    var i = 0
    while (i < n) {
      val d = md.digest(grams.getUTF8String(i).getBytes)
      val sb = new Array[Char](32)
      var j = 0
      while (j < 16) {
        sb(2 * j) = hex((d(j) >> 4) & 0xf)
        sb(2 * j + 1) = hex(d(j) & 0xf)
        j += 1
      }
      hs(i) = new String(sb)
      md.reset()
      i += 1
    }
    // monotonic deque of candidate indices; pop-back on >= → rightmost tie
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // deque is dq[head until tail]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var lastSel = -1
    val lastWindowStart = math.max(0, n - w)
    var e = 0
    while (e < n) {
      while (tail > head && hs(dq(tail - 1)).compareTo(hs(e)) >= 0) tail -= 1
      dq(tail) = e; tail += 1
      val j = e - w + 1 // window start whose full extent ends at e
      if (j >= 0 || e == n - 1) {
        // evict indices left of the (clipped) window start
        val start = math.max(0, math.min(j, lastWindowStart))
        while (dq(head) < start) head += 1
        // n < w: only one (clipped) window, evaluated at e == n-1
        if (j >= 0 || n < w) {
          val sel = dq(head)
          if (sel != lastSel) {
            out += org.apache.spark.sql.catalyst.InternalRow(
              sel, org.apache.spark.unsafe.types.UTF8String.fromString(hs(sel)))
            lastSel = sel
          }
        }
      }
      e += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnow", this, classOf[WinnowExpr].getName)
    defineCodeGen(ctx, ev, v => s"$self.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sequential-fold dot product of two float vectors in doubles — the
  * codegen'd twin of `Similarity.dot` (same accumulation order, so
  * bit-identical results). Split out from [[CosineSimExpr]] so the
  * brute-force ANN scan can HOIST the per-vector norms out of the
  * query×candidate fan-out: with hoisted norms each pair pays one
  * multiply-add loop instead of three.
  */
case class FloatDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayBinaryInputs {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold squared L2 norm of a float vector in doubles — the
  * codegen'd twin of `Similarity.norm2`, evaluated ONCE per vector row
  * below the ANN cross join (see [[FloatDotExpr]]).
  */
case class FloatNorm2Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.graftbridge.FloatArrayUnaryInput {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_norm2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      s += xi * xi
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      s"""
        int $n = $a.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.getFloat($i);
          $s += $xi * $xi;
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One 32-bit sign word of a float vector: bit j set iff vec[from+j] > 0 —
  * the codegen'd twin of the `Similarity.signWord` builtin fold (whose
  * `round(pow(2,j))` weights are exactly `1L << j` for j ≤ 31, so the longs
  * are identical). The fold ran interpreted at ~64 HOF lambda steps per
  * candidate row — the dominant per-row cost of the Hamming scan's bit-table
  * build; this is one tight loop inside whole-stage codegen. Components
  * beyond the vector's length contribute 0 bits, matching `element_at`'s
  * null → `otherwise(0)` branch in the fold. The comparison is
  * `Float.compare(v, 0f) > 0`, NOT the Java primitive `>`: Spark SQL's `>`
  * is a TOTAL order in which NaN sorts above every float (so the fold sets
  * the bit for a NaN component), and Float.compare implements the same
  * total order — a primitive `>` is false for NaN and the twins would
  * diverge on NaN-bearing vectors.
  */
case class SignWordExpr(child: Expression, from: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.graftbridge.FloatArrayUnaryInput {
  require(from >= 0, "from must be non-negative")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sign_word"

  def compute(a: ArrayData): Long = {
    val n = math.min(32, a.numElements() - from)
    var w = 0L
    var j = 0
    while (j < n) {
      if (java.lang.Float.compare(a.getFloat(from + j), 0f) > 0) w |= (1L << j)
      j += 1
    }
    w
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("signWord", this, classOf[SignWordExpr].getName)
    defineCodeGen(ctx, ev, a => s"$self.compute($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Threshold-gated overlap count of two SORTED string arrays — the verify
  * kernel of prefix-filtered Jaccard dedup (PPJoin family). Returns the
  * exact |A∩B| when Jaccard(A,B) ≥ tNum/tDen, else −1, via a single merge
  * scan with EARLY EXIT: the loop bails the moment the overlap counted so
  * far plus everything that could still match (min of the two remaining
  * suffixes) cannot reach c_min = ⌈t/(1+t)·(|A|+|B|)⌉ — the PPJoin+ suffix
  * bound applied continuously, not once. For a non-qualifying candidate
  * (the common case after the positional filter) the scan stops after a
  * few elements instead of hashing both full arrays the way
  * `array_intersect` does, and for qualifying pairs it is a branch-cheap
  * linear merge with zero allocation.
  *
  * Contract: BOTH inputs must be sorted ascending under Spark's UTF8String
  * binary ordering (`array_sort`) and duplicate-free (`array_distinct`) —
  * the producer owns that; the expression does not re-check. All
  * arithmetic is exact integer, so qualification (c·(tNum+tDen) ≥
  * tNum·(|A|+|B|)) is decided identically on any engine — the DuckDB
  * oracle's brute-force intersection agrees bit-for-bit.
  */
case class SortedOverlapExpr(left: Expression, right: Expression,
    tNum: Int, tDen: Int)
    extends BinaryExpression
    with org.apache.spark.sql.graftbridge.StringArrayBinaryInputs {
  require(tNum > 0 && tDen >= tNum, "threshold must be in (0, 1]")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sorted_overlap"

  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    // c_min = ceil(tNum*(na+nb) / (tNum+tDen)): c >= c_min  <=>  J >= t
    val cMin = (tNum.toLong * (na + nb) + (tNum + tDen - 1)) / (tNum + tDen)
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb &&
        c + math.min(na - i, nb - j) >= cMin) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    if (c >= cMin) c else -1L
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sortedOverlap", this,
      classOf[SortedOverlapExpr].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$self.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API: codegen'd cosine similarity. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: per-vector-scale symmetric int8 quantization (array<tinyint>). */
  def quantizeInt8(vec: Column): Column =
    Bridge.column(QuantizeInt8Expr(Bridge.expression(vec)))

  /** Column API: exact integer dot product of two int8 code vectors (bigint). */
  def intDot(a: Column, b: Column): Column =
    Bridge.column(IntDotExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: nearest-PQ-centroid code (int) for a fixed-point subvector
    * against a code-sorted codebook array.
    */
  def pqArgmin(sv: Column, cb: Column): Column =
    Bridge.column(PqArgminExpr(Bridge.expression(sv), Bridge.expression(cb)))

  /** Column API: all band sign-buckets of a float vector (array<int>). */
  def signBuckets(vec: Column, bands: Int, planesPerBand: Int, dims: Int = 64): Column =
    Bridge.column(SignBucketsExpr(Bridge.expression(vec), bands, planesPerBand, dims))

  /** Column API: 60-bit simhash of a token array. */
  def simhash(tokens: Column, bits: Int = 60): Column =
    Bridge.column(SimHashExpr(Bridge.expression(tokens), bits))

  /** Column API: word n-gram shingles of a token array. */
  def shingles(tokens: Column, n: Int): Column =
    Bridge.column(ShinglesExpr(Bridge.expression(tokens), n))

  /** Column API: MOSS winnowing selection over a gram array —
    * array<struct<pos:int, fp:string>> of distinct rightmost-min md5s.
    */
  def winnowSelect(grams: Column, w: Int): Column =
    Bridge.column(WinnowExpr(Bridge.expression(grams), w))

  /** Column API: early-exit overlap count of two sorted distinct string
    * arrays — |A∩B| if Jaccard ≥ tNum/tDen else −1.
    */
  def sortedOverlap(a: Column, b: Column, tNum: Int, tDen: Int): Column =
    Bridge.column(SortedOverlapExpr(Bridge.expression(a), Bridge.expression(b),
      tNum, tDen))

  /** Column API: codegen'd sequential-fold dot product (double). */
  def floatDot(a: Column, b: Column): Column =
    Bridge.column(FloatDotExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: codegen'd sequential-fold squared L2 norm (double). */
  def floatNorm2(a: Column): Column =
    Bridge.column(FloatNorm2Expr(Bridge.expression(a)))

  /** Column API: codegen'd 32-bit sign word from `from` (bigint). */
  def signWord32(vec: Column, from: Int): Column =
    Bridge.column(SignWordExpr(Bridge.expression(vec), from))

  private val info = new ExpressionInfo(
    classOf[CosineSimExpr].getName, "cosine_sim")

  /** Register `cosine_sim` + `top_k` for SQL on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"), info,
      exprs => CosineSimExpr(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "top_k"),
      exprs => TopKAgg.fromSql(exprs))
  }
}

/** Session extension wiring (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`): injects the
  * custom function surface and the disjunctive-semi-join rewrite at session
  * build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimExpr(exprs(0), exprs(1))))
    // top_k(col, k): bounded top-k aggregate (k must be a literal)
    e.injectFunction((
      FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "top_k"),
      (exprs: Seq[Expression]) => TopKAgg.fromSql(exprs)))
    e.injectOptimizerRule(_ => graft.plans.RewriteDisjunctiveSemiJoin)
    // materialized-rollup rewrite; no-op until RollupRegistry.register
    e.injectOptimizerRule(_ => graft.plans.RewriteAggregateToRollup)
  }
}

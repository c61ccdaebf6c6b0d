package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: fixed-order dot product of two float vectors in
  * double precision.
  *
  * Semantically identical (bitwise) to the 64-term left-associated SQL chain
  * `cast(a[1] as double)*cast(b[1] as double) + ...` that
  * [[graft.functions.Portable.dotSpark]] emits — a sequential `s += a_i*b_i`
  * loop performs the same left-assoc double additions — so swapping it into an
  * oracle-checked plan does not move a single result bit. The win is physical:
  * one tight codegen'd loop instead of a ~380-node expression tree, which keeps
  * janino compile time flat and the per-row cost at memory bandwidth. This is
  * the similarity-search hot path at 100 TB scale.
  */
case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float> arguments, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: polynomial rolling hash over Unicode code
  * points, `acc = (acc*131 + cp) mod 1e9+7` starting from 7.
  *
  * Bitwise-equal to [[graft.functions.Portable.phashSpark]]'s higher-order
  * `aggregate(transform(sequence(...)))` chain (Spark `substr`/`ascii` index
  * by code point, as does this loop) and to the DuckDB `list_reduce` oracle
  * form — but evaluated as one codegen'd loop instead of materializing a
  * per-character int array per row. This is the MinHash/SimHash shingle-hash
  * hot path: at 100 TB every token of the corpus passes through it.
  */
case class StringPolyHash(child: Expression) extends UnaryExpression {
  import graft.functions.Portable

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_phash expects a string argument, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    var acc = Portable.Seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * Portable.Mult + cp) % Portable.P
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $a.toString();
         |long $acc = ${Portable.Seed}L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * ${Portable.Mult}L + $cp) % ${Portable.P}L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: distinct word-n-gram shingle hashes of a text column,
  * `array<bigint>`. Semantically `array_distinct(shingles(tokens(text), n))`
  * mapped through [[StringPolyHash]] — but in one pass over the string with no
  * intermediate token/shingle arrays, which removes the dominant cost of the
  * MinHash signature path (interpreted higher-order-function lambdas).
  *
  * Hash-distinct equals string-distinct up to 1e9+7 collisions; the MinHash
  * signature (min over hashes) is insensitive to that, and exact Jaccard
  * verification still runs on true string shingles, so the oracle-checked
  * output is unaffected.
  */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with codegen.CodegenFallback {
  import graft.functions.Portable

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects (string, n>=1), got $other / n=$n")
  }

  private def phash(s: String): Long = {
    var acc = Portable.Seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * Portable.Mult + cp) % Portable.P
      i += Character.charCount(cp)
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.split(' ').filter(_.nonEmpty)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(phash(sb.toString))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: distinct word-n-gram shingle STRINGS of a text column,
  * `array<string>`, first-occurrence order. One pass, no intermediate
  * token/shingle arrays — replaces the interpreted higher-order-function
  * pipeline (`transform(sequence(...), concat_ws(slice(...)))`) whose
  * expression tree gets inlined multiple times by projection collapse and
  * dominates every shingle-consuming operator. Output is identical to
  * `array_distinct(Portable.shinglesSpark(tokens, n))`.
  */
case class ShingleStrings(child: Expression, n: Int)
  extends UnaryExpression with codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects (string, n>=1), got $other / n=$n")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.split(' ').filter(_.nonEmpty)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[org.apache.spark.unsafe.types.UTF8String])
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: single-space tokenization, empties dropped —
  * `array<string>` per row, value-identical to the portable HOF chain
  * `filter(split(s, ' '), x -> x <> '')` (leading/interior/trailing empties
  * all vanish under the filter, so Java's trailing-empty-dropping split
  * agrees; pinned by PortableParitySpec). The HOF chain evaluates an
  * interpreted lambda per array element and gets INLINED per consumer by
  * projection collapse — a query touching `toks` four times tokenized four
  * times through the interpreter. This is one flat JVM loop per evaluation.
  */
case class Tokens(child: Expression)
  extends UnaryExpression with codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens expects a string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.split(' ')
    var n = 0
    var i = 0
    while (i < toks.length) { if (toks(i).nonEmpty) n += 1; i += 1 }
    val out = new Array[AnyRef](n)
    i = 0; var k = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(toks(i))
        k += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: full MinHash signature (k minima over the affine hash
  * family) from an array of shingle hashes — `array<bigint>[k]` per row.
  *
  * This turns MinHash signatures into a PROJECTION: the per-document shingle
  * hash array is already one row, so there is no explode and no 126-column
  * aggregation. The aggregation formulation generated a ~6.5 MiB task binary
  * and 20s of codegen+JIT warmup per JVM; this is one flat loop.
  * Coefficients come from [[Portable.hashFamily]], the same family any
  * external reimplementation would embed.
  */
case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression with codegen.CodegenFallback {
  import graft.functions.Portable

  private lazy val fam: IndexedSeq[(Long, Long)] = Portable.hashFamily(k)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects (array<bigint>, k>=1), got $other / k=$k")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val (a, b) = fam(i)
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = (a * arr.getLong(j) + b) % Portable.P
        if (h < best) best = h
        j += 1
      }
      out(i) = best
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: count-weighted 60-bit SimHash fingerprint of a text
  * column as `array<bigint>[2]` (the two 30-bit halves). Identical integer
  * math to the exploded token/sum-aggregate formulation (and the DuckDB
  * oracle): token weights are occurrence counts, bit sums are
  * `w * (2*bit(h) - 1)`, a fingerprint bit is set when its sum > 0.
  */
case class SimHashFingerprint(child: Expression)
  extends UnaryExpression with codegen.CodegenFallback {
  import graft.functions.Portable

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects a string argument, got $other")
  }

  private def phash(s: String): Long = {
    var acc = Portable.Seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * Portable.Mult + cp) % Portable.P
      i += Character.charCount(cp)
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.split(' ').filter(_.nonEmpty)
    val counts = new java.util.HashMap[String, Long]
    toks.foreach(t => counts.merge(t, 1L, _ + _))
    val s1 = new Array[Long](Portable.SimBits)
    val s2 = new Array[Long](Portable.SimBits)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val w = e.getValue
      val h1 = phash(e.getKey)
      val h2 = (h1 * Portable.H2A + Portable.H2B) % Portable.P
      var j = 0
      while (j < Portable.SimBits) {
        s1(j) += w * (2 * ((h1 >> j) & 1) - 1)
        s2(j) += w * (2 * ((h2 >> j) & 1) - 1)
        j += 1
      }
    }
    var fp1 = 0L
    var fp2 = 0L
    var j = 0
    while (j < Portable.SimBits) {
      if (s1(j) > 0) fp1 |= (1L << j)
      if (s2(j) > 0) fp2 |= (1L << j)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(fp1, fp2))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native expression: random-hyperplane LSH bucket ids of a float vector,
  * `array<bigint>[nTables]` — bucket b of table t sets bit b when the dot
  * product against plane t*nBits+b is >= 0.
  *
  * Planes come from [[Portable.lshPlane]] (fixed LCG, exact dyadic values), so
  * the DuckDB oracle regenerates them from the same formula and the bucket ids
  * match bit-for-bit ([[Portable.lshBucketsDuckCtes]]). Replaces the former
  * `udf { (v: Seq[Float]) => ... }` hot path, which boxed every vector into a
  * Seq per row — this reads the columnar ArrayData directly.
  */
case class LshBucketIds(child: Expression, nTables: Int, nBits: Int)
  extends UnaryExpression with codegen.CodegenFallback {
  import graft.functions.Portable

  private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nTables * nBits, Portable.Dim)((p, d) => Portable.lshPlane(p, d))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if nTables >= 1 && nBits >= 1 && nBits <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets expects (array<float>, nTables>=1, 1<=nBits<=62), got $other / $nTables / $nBits")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < nBits) {
        val p = planes(t * nBits + b)
        var dot = 0.0
        var i = 0
        val n = math.min(v.numElements(), p.length)
        while (i < n) { dot += v.getFloat(i).toDouble * p(i); i += 1 }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registration for graft's native expressions.
  *
  * Two paths to the same registry entry:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (cluster-config style);
  *  - [[GraftFunctions.register]] for programmatic, idempotent registration on
  *    an existing session (operators call it themselves so any session works).
  */
object GraftFunctions {
  val dotInfo = new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot")
  val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => ArrayDotProduct(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_dot takes exactly 2 arguments, got ${other.size}")
  }

  val phashInfo = new ExpressionInfo(classOf[StringPolyHash].getName, "graft_phash")
  val phashBuilder: Seq[Expression] => Expression = {
    case Seq(a) => StringPolyHash(a)
    case other => throw new IllegalArgumentException(
      s"graft_phash takes exactly 1 argument, got ${other.size}")
  }

  val shingleInfo = new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes")
  val shingleBuilder: Seq[Expression] => Expression = {
    case Seq(a, Literal(n: Int, IntegerType)) => ShingleHashes(a, n)
    case other => throw new IllegalArgumentException(
      s"graft_shingle_hashes takes (col, int literal), got $other")
  }

  val shingleStrInfo = new ExpressionInfo(classOf[ShingleStrings].getName, "graft_shingles")
  val shingleStrBuilder: Seq[Expression] => Expression = {
    case Seq(a, Literal(n: Int, IntegerType)) => ShingleStrings(a, n)
    case other => throw new IllegalArgumentException(
      s"graft_shingles takes (col, int literal), got $other")
  }

  val minhashInfo = new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash")
  val minhashBuilder: Seq[Expression] => Expression = {
    case Seq(a, Literal(k: Int, IntegerType)) => MinHashSignature(a, k)
    case other => throw new IllegalArgumentException(
      s"graft_minhash takes (col, int literal), got $other")
  }

  val simhashInfo = new ExpressionInfo(classOf[SimHashFingerprint].getName, "graft_simhash")
  val simhashBuilder: Seq[Expression] => Expression = {
    case Seq(a) => SimHashFingerprint(a)
    case other => throw new IllegalArgumentException(
      s"graft_simhash takes exactly 1 argument, got ${other.size}")
  }

  val tokensInfo = new ExpressionInfo(classOf[Tokens].getName, "graft_tokens")
  val tokensBuilder: Seq[Expression] => Expression = {
    case Seq(a) => Tokens(a)
    case other => throw new IllegalArgumentException(
      s"graft_tokens takes exactly 1 argument, got ${other.size}")
  }

  val tsMultiInfo = new ExpressionInfo(classOf[MultiFormatTimestamp].getName, "graft_ts_multi")
  val tsMultiBuilder: Seq[Expression] => Expression = {
    case Seq(a) => MultiFormatTimestamp(a)
    case other => throw new IllegalArgumentException(
      s"graft_ts_multi takes exactly 1 argument, got ${other.size}")
  }

  val dateMultiInfo = new ExpressionInfo(classOf[MultiFormatDate].getName, "graft_date_multi")
  val dateMultiBuilder: Seq[Expression] => Expression = {
    case Seq(a) => MultiFormatDate(a)
    case other => throw new IllegalArgumentException(
      s"graft_date_multi takes exactly 1 argument, got ${other.size}")
  }

  val lshInfo = new ExpressionInfo(classOf[LshBucketIds].getName, "graft_lsh_buckets")
  val lshBuilder: Seq[Expression] => Expression = {
    case Seq(a, Literal(t: Int, IntegerType), Literal(b: Int, IntegerType)) => LshBucketIds(a, t, b)
    case other => throw new IllegalArgumentException(
      s"graft_lsh_buckets takes (col, int literal, int literal), got $other")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot", dotBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_phash", phashBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_hashes", shingleBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_shingles", shingleStrBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_minhash", minhashBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_simhash", simhashBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_tokens", tokensBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_lsh_buckets", lshBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_ts_multi", tsMultiBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_date_multi", dateMultiBuilder, "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"), GraftFunctions.dotInfo, GraftFunctions.dotBuilder))
    ext.injectFunction((FunctionIdentifier("graft_phash"), GraftFunctions.phashInfo, GraftFunctions.phashBuilder))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"), GraftFunctions.shingleInfo, GraftFunctions.shingleBuilder))
    ext.injectFunction((FunctionIdentifier("graft_shingles"), GraftFunctions.shingleStrInfo, GraftFunctions.shingleStrBuilder))
    ext.injectFunction((FunctionIdentifier("graft_minhash"), GraftFunctions.minhashInfo, GraftFunctions.minhashBuilder))
    ext.injectFunction((FunctionIdentifier("graft_simhash"), GraftFunctions.simhashInfo, GraftFunctions.simhashBuilder))
    ext.injectFunction((FunctionIdentifier("graft_tokens"), GraftFunctions.tokensInfo, GraftFunctions.tokensBuilder))
    ext.injectFunction((FunctionIdentifier("graft_lsh_buckets"), GraftFunctions.lshInfo, GraftFunctions.lshBuilder))
    ext.injectFunction((FunctionIdentifier("graft_ts_multi"), GraftFunctions.tsMultiInfo, GraftFunctions.tsMultiBuilder))
    ext.injectFunction((FunctionIdentifier("graft_date_multi"), GraftFunctions.dateMultiInfo, GraftFunctions.dateMultiBuilder))
  }
}

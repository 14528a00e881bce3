package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY §7.3: native fast paths where a Scala
  * UDF would sit in the hot loop). Each generates a single static call in
  * whole-stage codegen — no boxing, no Row allocation, no UDF serialization.
  *
  * These give the engine the scalar primitives the reference lacked entirely
  * (its only extension point is the row-level poly transform,
  * reference: framework/ubw-core/.../PileHelper.scala:117-179).
  */

/** 64-bit FNV-1a document fingerprint of a string column. */
case class Fingerprint64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint64"

  override protected def nullSafeEval(input: Any): Any =
    TextHash.fnv1a64(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.fnv1a64(($c).getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

/** 64-bit SimHash signature of a token array column. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child.dataType), Seq(ArrayType(StringType)))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Cosine similarity of two float-array columns, as double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(left.dataType, right.dataType),
      Seq(ArrayType(FloatType), ArrayType(FloatType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Dot product of two float-array columns, as double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(left.dataType, right.dataType),
      Seq(ArrayType(FloatType), ArrayType(FloatType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** MinHash signature (array<long> of `numHashes` mins) of a shingle array —
  * one fused JVM pass; see TextHash.minhashSig. */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child.dataType), Seq(ArrayType(StringType)))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashSig(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.minhashSig($c, $numHashes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Feature-hashed, L2-normalized tf vector of a token array — one fused
  * codegen call; see TextHash.hashedTfVector. */
case class HashedTfVector(child: Expression, dim: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child.dataType), Seq(ArrayType(StringType)))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_hashed_tf_vector"

  override protected def nullSafeEval(input: Any): Any =
    TextHash.hashedTfVector(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.hashedTfVector($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedTfVector =
    copy(child = newChild)
}

/** Intersection size of two sorted de-duplicated string arrays. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(left.dataType, right.dataType),
      Seq(ArrayType(StringType), ArrayType(StringType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sortedIntersectCount(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** Word k-shingles of a string column — fused codegen twin of the
  * interpreted HOF formulation; see TextHash.wordShingles. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child.dataType), Seq(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    TextHash.wordShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.wordShingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** All unordered id pairs of a bucket's long-array members, as
  * struct(id_a ≤ id_b) — codegen'd bucket expansion for the LSH dedup
  * family; see PairOps. */
case class ExpandIdPairs(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExprChecks.expect(prettyName, Seq(child.dataType), Seq(ArrayType(LongType)))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_expand_id_pairs"

  override protected def nullSafeEval(input: Any): Any =
    PairOps.expandIdPairs(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PairOps.expandIdPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): ExpandIdPairs =
    copy(child = newChild)
}

/** Unordered (id_a, id_b, hamming) pairs of a (doc_id, sig) bucket with
  * hamming ≤ maxHamming; see PairOps.expandSigPairs. */
case class ExpandSigPairs(child: Expression, maxHamming: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<long,long>>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("hamming", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_expand_sig_pairs"

  override protected def nullSafeEval(input: Any): Any =
    PairOps.expandSigPairs(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], maxHamming)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PairOps.expandSigPairs($c, $maxHamming)")

  override protected def withNewChildInternal(newChild: Expression): ExpandSigPairs =
    copy(child = newChild)
}

/** First-colliding-band pair expansion for the exact-jaccard tier: members
  * are (doc_id, sz, bandHashes) structs, `band` is the current band index;
  * pairs are size-filtered and emitted exactly once across all bands.
  * See PairOps.expandSizedPairsFirstBand. */
case class ExpandSizedPairsFirstBand(
    left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StructType(Array(a, b, c)), _), IntegerType)
        if a.dataType == LongType && b.dataType == IntegerType &&
          c.dataType.isInstanceOf[ArrayType] =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<struct<long,int,array<long>>>, int), " +
        s"got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_expand_sized_pairs"

  override protected def nullSafeEval(ms: Any, band: Any): Any =
    PairOps.expandSizedPairsFirstBand(
      ms.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      band.asInstanceOf[Int], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ms, band) =>
      s"graft.functions.PairOps.expandSizedPairsFirstBand($ms, $band, $threshold)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ExpandSizedPairsFirstBand =
    copy(left = l, right = r)
}

/** Minimal input-type validation shared by the custom expressions (stand-in
  * for ExpectsInputTypes, whose AbstractDataType is private[sql]). Nullable
  * array element flags are ignored on purpose. */
object GraftExprChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private def same(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(x, _), ArrayType(y, _)) => same(x, y)
    case _ => a == b
  }

  def expect(name: String, actual: Seq[DataType], wanted: Seq[DataType]): TypeCheckResult =
    if (actual.zip(wanted).forall { case (a, w) => same(a, w) }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects (${wanted.map(_.simpleString).mkString(", ")}), " +
        s"got (${actual.map(_.simpleString).mkString(", ")})")
}

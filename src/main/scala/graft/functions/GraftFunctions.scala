package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Registration for graft's native expressions.
  *
  * Two routes:
  *   - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (the production config-time route), and
  *   - [[GraftFunctions.register]] for an already-built session (the
  *     driver owns session construction in this harness, so queries call
  *     this idempotently at build time).
  */
object GraftFunctions {

  private[functions] def cosineBuilder(args: Seq[Expression]): Expression = args match {
    // Cast stands in for ExpectsInputTypes' implicit coercion (float
    // arrays welcome); a double->double array cast folds away.
    case Seq(a, b) =>
      CosineSimilarity(Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))
    case _ => throw new IllegalArgumentException(s"cosine_similarity expects 2 arguments, got ${args.size}")
  }

  private[functions] def shinglesBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(arr, n) =>
      val width = n match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"word_shingles width must be an int literal, got $other")
      }
      WordShingles(arr, width)
    case _ => throw new IllegalArgumentException(s"word_shingles expects 2 arguments, got ${args.size}")
  }

  private[functions] def tryToIntBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(s) => TryToInt(Cast(s, org.apache.spark.sql.types.StringType))
    case _ => throw new IllegalArgumentException(s"try_to_int expects 1 argument, got ${args.size}")
  }

  // Spark ships BloomFilterAggregate / BloomFilterMightContain as
  // optimizer-internal expressions (InjectRuntimeFilter builds them
  // directly) without SQL registration. Exposing them as functions
  // gives queries the "guard a new batch against a history bloom
  // without a join" pattern — the filter side stays a scalar subquery,
  // which is the form MightContain's input check demands.
  private[functions] def bloomAggBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(child, items, bits) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child, items, bits)
    case Seq(child, items) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child, items)
    case Seq(child) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child)
    case _ => throw new IllegalArgumentException(s"bloom_filter_agg expects 1-3 arguments, got ${args.size}")
  }

  private[functions] def mightContainBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(bf, v) => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(bf, v)
    case _ => throw new IllegalArgumentException(s"bloom_might_contain expects 2 arguments, got ${args.size}")
  }

  private[functions] def nearestL2Builder(args: Seq[Expression]): Expression = args match {
    case Seq(sv, cbs) => NearestCentroidL2(Cast(sv, ArrayType(DoubleType)), cbs)
    case _ => throw new IllegalArgumentException(s"nearest_centroid_l2 expects 2 arguments, got ${args.size}")
  }

  private[functions] def rankCosBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(v, cbs) => CentroidRankCos(Cast(v, ArrayType(DoubleType)), cbs)
    case _ => throw new IllegalArgumentException(s"centroid_rank_cos expects 2 arguments, got ${args.size}")
  }

  private[functions] def charBigramsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(s) => CharBigramCodes(Cast(s, org.apache.spark.sql.types.StringType))
    case _ => throw new IllegalArgumentException(s"char_bigram_codes expects 1 argument, got ${args.size}")
  }

  private[functions] def simhashAggBuilder(args: Seq[Expression]): Expression = args match {
    // the analyzer wraps a bare AggregateFunction in AggregateExpression
    case Seq(lo, hi) =>
      SimHashAgg(Cast(lo, org.apache.spark.sql.types.LongType), Cast(hi, org.apache.spark.sql.types.LongType))
    case _ => throw new IllegalArgumentException(s"simhash_agg expects 2 arguments, got ${args.size}")
  }

  private[functions] def avgArrayBuilder(args: Seq[Expression]): Expression = args match {
    // the analyzer wraps a bare AggregateFunction in AggregateExpression
    case Seq(arr, nExp) =>
      val n = nExp match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"avg_array width must be an int literal, got $other")
      }
      AvgArray(Cast(arr, ArrayType(DoubleType)), n)
    case _ => throw new IllegalArgumentException(s"avg_array expects 2 arguments, got ${args.size}")
  }

  /** Idempotent: safe to call from every query builder. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction("cosine_similarity", cosineBuilder, "built-in")
    registry.createOrReplaceTempFunction("word_shingles", shinglesBuilder, "built-in")
    registry.createOrReplaceTempFunction("try_to_int", tryToIntBuilder, "built-in")
    registry.createOrReplaceTempFunction("bloom_filter_agg", bloomAggBuilder, "built-in")
    registry.createOrReplaceTempFunction("bloom_might_contain", mightContainBuilder, "built-in")
    registry.createOrReplaceTempFunction("nearest_centroid_l2", nearestL2Builder, "built-in")
    registry.createOrReplaceTempFunction("centroid_rank_cos", rankCosBuilder, "built-in")
    registry.createOrReplaceTempFunction("char_bigram_codes", charBigramsBuilder, "built-in")
    registry.createOrReplaceTempFunction("simhash_agg", simhashAggBuilder, "built-in")
    registry.createOrReplaceTempFunction("avg_array", avgArrayBuilder, "built-in")
  }
}

/** `SparkSessionExtensions` hook: injects graft functions at session
  * build time (`--conf spark.sql.extensions=graft.functions.GraftExtensions`).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    // same builder as GraftFunctions.register — identical coercion and
    // arity errors on both registration routes
    ext.injectFunction(
      (
        FunctionIdentifier("cosine_similarity"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
        (args: Seq[Expression]) => GraftFunctions.cosineBuilder(args),
      ),
    )
    ext.injectFunction(
      (
        FunctionIdentifier("word_shingles"),
        new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
        (args: Seq[Expression]) => GraftFunctions.shinglesBuilder(args),
      ),
    )
    ext.injectFunction(
      (
        FunctionIdentifier("try_to_int"),
        new ExpressionInfo(classOf[TryToInt].getName, "try_to_int"),
        (args: Seq[Expression]) => GraftFunctions.tryToIntBuilder(args),
      ),
    )
    ext.injectFunction(
      (
        FunctionIdentifier("bloom_filter_agg"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
          "bloom_filter_agg",
        ),
        (args: Seq[Expression]) => GraftFunctions.bloomAggBuilder(args),
      ),
    )
    ext.injectFunction(
      (
        FunctionIdentifier("bloom_might_contain"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
          "bloom_might_contain",
        ),
        (args: Seq[Expression]) => GraftFunctions.mightContainBuilder(args),
      ),
    )
    ext.injectFunction(
      (
        FunctionIdentifier("nearest_centroid_l2"),
        new ExpressionInfo(classOf[NearestCentroidL2].getName, "nearest_centroid_l2"),
        (args: Seq[Expression]) => GraftFunctions.nearestL2Builder(args),
      ),
    )
    ext.injectFunction(
      (
        FunctionIdentifier("centroid_rank_cos"),
        new ExpressionInfo(classOf[CentroidRankCos].getName, "centroid_rank_cos"),
        (args: Seq[Expression]) => GraftFunctions.rankCosBuilder(args),
      ),
    )
    ext.injectFunction(
      (
        FunctionIdentifier("char_bigram_codes"),
        new ExpressionInfo(classOf[CharBigramCodes].getName, "char_bigram_codes"),
        (args: Seq[Expression]) => GraftFunctions.charBigramsBuilder(args),
      ),
    )
    ext.injectFunction(
      (
        FunctionIdentifier("simhash_agg"),
        new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
        (args: Seq[Expression]) => GraftFunctions.simhashAggBuilder(args),
      ),
    )
    ext.injectFunction(
      (
        FunctionIdentifier("avg_array"),
        new ExpressionInfo(classOf[AvgArray].getName, "avg_array"),
        (args: Seq[Expression]) => GraftFunctions.avgArrayBuilder(args),
      ),
    )
    ()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{FixedPointDot, HammingLE, LshBucket, MinHashSig, RollingHash, WordShingles}

/** SQL-function surface of the engine: the reference's string helpers and
  * the fingerprint hash as native Catalyst expression trees (composed from
  * built-in expressions — codegen'd end to end, no UDF boxing), plus the
  * two registration paths:
  *
  *  - `GraftFunctions.registerAll(spark)` on a live session;
  *  - `GraftExtensions` via `spark.sql.extensions` config / `withExtensions`
  *    at session build time (the idiomatic deployment path).
  *
  * Expression semantics mirror graft.functions.StrFunctions (reference:
  * sdk/lib/str.php:11-31 — "" when the separator is absent, and for
  * str_before also when it sits at position 0).
  */
object GraftFunctions {

  private val emptyStr = Literal(UTF8String.fromString(""), StringType)

  /** str_before(str, sep) as a Catalyst expression tree. */
  def strBeforeExpr(str: Expression, sep: Expression): Expression =
    If(LessThanOrEqual(StringInstr(str, sep), Literal(1)),
      emptyStr,
      SubstringIndex(str, sep, Literal(1)))

  /** str_after(str, sep) as a Catalyst expression tree. */
  def strAfterExpr(str: Expression, sep: Expression): Expression =
    If(EqualTo(StringInstr(str, sep), Literal(0)),
      emptyStr,
      Substring(str,
        Add(StringInstr(str, sep), Length(sep)),
        Length(str)))

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name requires $n argument(s), got ${exprs.length}")
      f(exprs)
    }

  /** A static-int argument (shingle size, plane/component count) must be a
    * foldable literal — these parameters shape the generated code, they are
    * not per-row data.
    */
  private def litInt(name: String, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$name: argument must be a literal integer")
    e.eval(null) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: expected an integer literal, got $other")
    }
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> arity("rolling_hash", 1)(exprs =>
      RollingHash(exprs.head)),
    "str_before" -> arity("str_before", 2)(exprs =>
      strBeforeExpr(exprs(0), exprs(1))),
    "str_after" -> arity("str_after", 2)(exprs =>
      strAfterExpr(exprs(0), exprs(1))),
    // Native codegen vector/dedup primitives (graft.functions.*)
    "fp_dot" -> arity("fp_dot", 2)(exprs =>
      FixedPointDot(exprs(0), exprs(1))),
    // lsh_bucket(vec, nPlanes[, planeOffset]) — the optional offset selects
    // a disjoint slice of the static plane matrix (table t of an ensemble
    // passes t * nPlanes).
    "lsh_bucket" -> (exprs => {
      if (exprs.length != 2 && exprs.length != 3)
        throw new IllegalArgumentException(
          s"lsh_bucket requires 2 or 3 arguments, got ${exprs.length}")
      LshBucket(exprs(0), litInt("lsh_bucket", exprs(1)),
        if (exprs.length == 3) litInt("lsh_bucket", exprs(2)) else 0)
    }),
    "word_shingles" -> arity("word_shingles", 2)(exprs =>
      WordShingles(exprs(0), litInt("word_shingles", exprs(1)))),
    "word_chunks" -> arity("word_chunks", 2)(exprs =>
      graft.functions.WordChunks(exprs(0),
        litInt("word_chunks", exprs(1)))),
    "minhash_sig" -> arity("minhash_sig", 2)(exprs =>
      MinHashSig(exprs(0), litInt("minhash_sig", exprs(1)))),
    // hamming_le(codeA, codeB, d) — similarity-join predicate; joins whose
    // condition carries it are rewritten by plans.HammingJoinRewrite
    "hamming_le" -> arity("hamming_le", 3)(exprs =>
      HammingLE(exprs(0), exprs(1), litInt("hamming_le", exprs(2)))),
    // misra_gries(item, k) — heavy-hitters candidate summary (aggregate;
    // the analyzer wraps the bare AggregateFunction)
    "misra_gries" -> arity("misra_gries", 2)(exprs =>
      graft.functions.MisraGriesAgg(exprs(0),
        litInt("misra_gries", exprs(1)))),
    // count_min(item, width, depth) — approximate-frequency sketch
    // aggregate; counters are order-independent sums, so estimates gate
    "count_min" -> arity("count_min", 3)(exprs =>
      graft.functions.CountMinAgg(exprs(0),
        litInt("count_min", exprs(1)), litInt("count_min", exprs(2)))),
    // bloom_build(item, numBits, numHashes) — membership filter aggregate
    "bloom_build" -> arity("bloom_build", 3)(exprs =>
      graft.functions.BloomFilterAgg(exprs(0),
        litInt("bloom_build", exprs(1)), litInt("bloom_build", exprs(2)))),
    // bloom_might_contain(filter, item, numHashes) — codegen'd probe
    "bloom_might_contain" -> arity("bloom_might_contain", 3)(exprs =>
      graft.functions.BloomMightContain(exprs(0), exprs(1),
        litInt("bloom_might_contain", exprs(2)))),
    // z_order(x, y) — Morton interleave for 2-D data layout clustering
    "z_order" -> arity("z_order", 2)(exprs =>
      graft.functions.ZOrder2(exprs(0), exprs(1))),
    // media_dims(binary) — container magic + pixel dimensions from the
    // payload's leading bytes (PNG/JPEG/GIF/BMP), codegen'd header sniff
    "media_dims" -> arity("media_dims", 1)(exprs =>
      graft.functions.MediaDims(exprs.head)),
    // audio_meta(binary) — container magic + stream parameters from the
    // payload's leading bytes (WAV/FLAC/MP3), codegen'd header sniff
    "audio_meta" -> arity("audio_meta", 1)(exprs =>
      graft.functions.AudioMeta(exprs.head)),
    // dhash56(string) — 56-bit perceptual difference hash over the
    // payload's code points (stub-pixel contract; Hamming-joinable)
    "dhash56" -> arity("dhash56", 1)(exprs =>
      graft.functions.DHash56(exprs.head)),
    // cdc_chunks(string) — content-defined chunk structs
    // (start, len, digest); FastCDC-style rolling-hash boundaries
    "cdc_chunks" -> arity("cdc_chunks", 1)(exprs =>
      graft.functions.CdcChunks(exprs.head)),
    // gif_frames(binary) — per-frame structs (index, placement,
    // dimensions, GCE delay, local palette) from the GIF block walk
    "gif_frames" -> arity("gif_frames", 1)(exprs =>
      graft.functions.GifFrames(exprs.head)),
    // bmp_thumb(binary, gridW, gridH) — true-pixel box-average thumbnail
    // of an uncompressed 24-bpp BMP as RGB hex
    "bmp_thumb" -> arity("bmp_thumb", 3)(exprs =>
      graft.functions.BmpThumb(exprs(0), litInt("bmp_thumb", exprs(1)),
        litInt("bmp_thumb", exprs(2)))),
    // png_thumb(binary, gridW, gridH) — full PNG decode (inflate +
    // unfilter) and true-pixel box-average thumbnail as RGB hex
    "png_thumb" -> arity("png_thumb", 3)(exprs =>
      graft.functions.PngThumb(exprs(0), litInt("png_thumb", exprs(1)),
        litInt("png_thumb", exprs(2)))),
    // exif_meta(binary) — orientation/make/model/datetime from the JPEG
    // APP1 TIFF walk
    "exif_meta" -> arity("exif_meta", 1)(exprs =>
      graft.functions.ExifMeta(exprs.head)),
    // audio_blocks(binary, nBlocks) — per-block peak + exact sum of
    // squares from a PCM WAV's actual int16 samples
    "audio_blocks" -> arity("audio_blocks", 2)(exprs =>
      graft.functions.AudioBlocks(exprs(0),
        litInt("audio_blocks", exprs(1)))))

  /** Register on a live session (temp functions). */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Plan-level safety checks injected via `SparkSessionExtensions`.
  *
  * The one check so far guards the SELF-JOIN LINEAGE TRAP: when both join
  * sides derive from the same DataFrame, an un-aliased
  * `col("k") === col("k")` resolves BOTH sides to one attribute — the
  * condition is trivially true and the equi-join silently degrades to a
  * cross join (Spark only logs a warning). Every LSH/banding pipeline in
  * this engine aliases per side precisely to dodge this; the check rule
  * turns the remaining footgun into a fail-fast analysis error for any
  * session built with [[GraftExtensions]].
  */
object GraftChecks {
  import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

  def trivialSelfJoin(plan: LogicalPlan): Unit =
    // collectWithSubqueries: the trapped join may sit inside an IN/EXISTS
    // subquery plan, which plain foreach does not descend into
    plan.collectWithSubqueries { case j: Join =>
      j.condition.foreach(_.foreach {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if a.exprId == b.exprId => fail(a, b)
        case EqualNullSafe(a: AttributeReference, b: AttributeReference)
            if a.exprId == b.exprId => fail(a, b)
        case _ => ()
      })
    }

  private def fail(a: AttributeReference, b: AttributeReference): Nothing =
    throw new IllegalArgumentException(
      s"join condition '${a.name} = ${b.name}' compares an attribute " +
        "with itself (both sides resolve to the same column — the " +
        "self-join lineage trap); alias the join key differently on " +
        "each side, e.g. .select(col(\"k\").as(\"k_a\"))")
}

/** Session-build-time registration:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftFunctions", name), builder))
    }
    e.injectCheckRule(_ => GraftChecks.trivialSelfJoin)
    // tier-(c): similarity joins written declaratively (hamming_le in a
    // join condition) re-plan from nested-loop to chunked equality join
    e.injectOptimizerRule(_ => graft.plans.HammingJoinRewrite)
    // tier-(c): numeric band joins (abs(a-b) <= d) re-plan from
    // nested-loop to a bucket equality join (exact, multiplicity-safe)
    e.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}

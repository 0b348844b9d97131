package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Shared analysis-time input validation for the kernel expressions.
  *
  * The kernels read raw buffers (`getLong` strides, UTF8String bytes),
  * so a wrong-typed input would not fail cleanly at runtime: an
  * `array<int>` fed to a long-array kernel reads misaligned bytes and
  * returns GARBAGE silently, and a non-string text input dies mid-job
  * with a ClassCastException. Since [[graft.GraftExtensions]] exposes
  * every kernel to arbitrary `spark.sql(...)` input, each one validates
  * its child types at analysis instead (the role `ExpectsInputTypes`
  * plays for built-ins — its `AbstractDataType` is private[sql], hence
  * this small shim).
  */
private[functions] object KernelTypeChecks {

  def expectString(fn: String, arg: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn: argument '$arg' must be string, got ${other.simpleString}")
    }

  /** Element type must match exactly; `containsNull` is accepted either
    * way (null elements read as the zero value, like the built-ins'
    * primitive accessors). */
  def expectArrayOf(fn: String, arg: String, child: Expression,
      element: DataType): TypeCheckResult =
    child.dataType match {
      case ArrayType(e, _) if e == element => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn: argument '$arg' must be array<${element.simpleString}>, got ${other.simpleString}")
    }

  /** Like [[expectArrayOf]], but also rejects `containsNull = true`
    * arrays. The long-array kernels stride `getLong` over the raw
    * buffer, where a null element reads as 0 SILENTLY — fine for the
    * internal producers ([[ShingleHashes]], `collect_list`, which
    * declare containsNull = false), but a `spark.sql(...)` user passing
    * `array(1L, NULL)` would get a plausible-looking wrong signature or
    * count with no error. Since analysis can't prove element
    * non-nullness at runtime, require the TYPE to promise it; callers
    * with nullable arrays make the promise explicit via
    * `array_compact(...)` (which drops nulls AND narrows containsNull —
    * a lambda `filter` keeps the nullable element type). */
  def expectNonNullArrayOf(fn: String, arg: String, child: Expression,
      element: DataType): TypeCheckResult =
    child.dataType match {
      case ArrayType(e, false) if e == element => TypeCheckResult.TypeCheckSuccess
      case ArrayType(e, true) if e == element => TypeCheckResult.TypeCheckFailure(
        s"$fn: argument '$arg' must be array<${element.simpleString}> WITHOUT null " +
          "elements (containsNull = false); null elements would read as 0 silently — " +
          "apply array_compact() first")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn: argument '$arg' must be array<${element.simpleString}>, got ${other.simpleString}")
    }

  def firstFailure(results: TypeCheckResult*): TypeCheckResult =
    results.find(!_.isSuccess).getOrElse(TypeCheckResult.TypeCheckSuccess)
}

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

  def firstFailure(results: TypeCheckResult*): TypeCheckResult =
    results.find(!_.isSuccess).getOrElse(TypeCheckResult.TypeCheckSuccess)
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Key-material reference that stays OUT of plan strings.
  *
  * A `lit(key)` literal prints the key into `explain()` output, the UI
  * SQL tab, event logs, and error messages — operational key leakage
  * (the reference keeps its column-privacy key behind a named-secret
  * indirection for exactly this reason,
  * /root/reference/config/globalConfig.json:8). This leaf expression
  * carries the key only as an ordinary field of the serialized task
  * binary (the same channel any Literal travels by); every rendered form
  * — `toString`, `simpleString`, `sql`, codegen comments — shows
  * `graft_secret_key(<name>, v<version>)` and never the material.
  *
  * Non-foldable by declaration: ConstantFolding would otherwise collapse
  * it into a visible `Literal`, undoing the point. Evaluation is a
  * constant return, so the `CodegenFallback` call amortizes to a field
  * read per row.
  */
case class SecretKeyRef(secretName: String, version: Int, key: String)
    extends LeafExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  @transient private lazy val utf8 = UTF8String.fromString(key)
  override def eval(input: InternalRow): Any = utf8

  // every printed form hides the key
  override protected def stringArgs: Iterator[Any] =
    Iterator(secretName, s"v$version")
  override def prettyName: String = "graft_secret_key"
  override def sql: String = s"graft_secret_key('$secretName', $version)"
}

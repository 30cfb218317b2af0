package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** P1 — JSON key-subset projection (/root/reference/sse.py:233-237).
  *
  * Parses the payload, keeps only the requested top-level keys and
  * re-serializes — preserving the original JSON value types, which the
  * `from_json(Map[String,String])` + `to_json` built-in route cannot do
  * (it would stringify numbers/bools). Kept keys emit in PAYLOAD order,
  * matching the reference byte-for-byte: sse.py:237 iterates the payload
  * items and checks membership, so the `filter` param's order never
  * affects the frame bytes.
  *
  * Deviation from the reference: a malformed payload yields NULL instead of
  * killing the stream (the reference's parse would raise and tear down the
  * connection generator).
  *
  * Uses Jackson, which ships on the Spark classpath. `CodegenFallback`
  * keeps it inside whole-stage codegen spans as a non-codegen leaf call;
  * the JSON parse itself dominates cost either way.
  */
case class JsonKeySubset(child: Expression, keys: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "json_key_subset"

  @transient private lazy val mapper = new ObjectMapper()
  @transient private lazy val keySet: Set[String] = keys.toSet

  override def nullSafeEval(input: Any): Any =
    try {
      val root = mapper.readTree(input.toString)
      if (!root.isObject) null
      else {
        val out = mapper.createObjectNode()
        val it = root.fields()
        while (it.hasNext) {
          val e = it.next()
          if (keySet(e.getKey))
            out.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue)
        }
        UTF8String.fromString(mapper.writeValueAsString(out))
      }
    } catch { case _: Exception => null }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonKeySubset {
  /** Column-API entry point. */
  def apply(json: Column, keys: Seq[String]): Column =
    shims.toColumn(JsonKeySubset(shims.toExpression(json), keys))
}

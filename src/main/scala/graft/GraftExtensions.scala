package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.{RowNumberToTopKRule, TopKColumnPruningRule, TopKStrategy}

import graft.functions.{AvroDecode, AvroEncode, LongVecDot}

/** Session extension registering the engine's custom Catalyst surface, so
  * SQL users get it without touching the Scala API:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ... // or .withExtensions(new GraftExtensions()(_))
  *   spark.sql("SELECT long_vec_dot(a, b) FROM vectors")
  * }}}
  *
  * Currently: `long_vec_dot` ([[graft.functions.LongVecDot]], the
  * codegen'd exact integer dot product behind q18/q19/q28/q30),
  * `graft_to_avro`/`graft_from_avro` ([[graft.functions.AvroEncode]]/
  * [[graft.functions.AvroDecode]], the Catalyst Avro codec with the
  * schema as a literal argument), and the
  * planner strategy for the native top-k-per-key operator
  * ([[org.apache.spark.sql.graftbridge.TopKPerKey]], used through
  * [[graft.operators.TopK]]). These are the (c)-tier extension points of
  * the build brief — used only where a built-in genuinely can't express
  * the semantics efficiently; everything else in the engine is plain
  * `org.apache.spark.sql.functions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => RowNumberToTopKRule)
    // runs inside the fixed-point operator-optimization batch, so built-in
    // ColumnPruning pushes the Project this rule inserts down to the scan
    ext.injectOptimizerRule(_ => TopKColumnPruningRule)
    ext.injectFunction((
      new FunctionIdentifier("long_vec_dot"),
      new ExpressionInfo(
        classOf[LongVecDot].getName, null, "long_vec_dot",
        "long_vec_dot(a, b) - exact dot product of two array<bigint> vectors",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "long_vec_dot takes exactly 2 arguments")
        LongVecDot(children.head, children(1))
      }))
    // SQL surface for the Catalyst Avro codec: the schema argument must
    // be a foldable string (a literal or something constant-folding
    // reduces to one) — it shapes the expression's data type, which SQL
    // analysis needs before any row exists.
    def schemaArg(e: Expression, fn: String): String = {
      require(e.foldable && e.dataType ==
        org.apache.spark.sql.types.StringType,
        s"$fn: the Avro schema argument must be a string literal")
      e.eval().toString
    }
    ext.injectFunction((
      new FunctionIdentifier("graft_to_avro"),
      new ExpressionInfo(
        classOf[AvroEncode].getName, null, "graft_to_avro",
        "graft_to_avro(struct, schemaJson) - encode a struct to Avro binary",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_to_avro takes exactly 2 arguments")
        AvroEncode(children.head, schemaArg(children(1), "graft_to_avro"))
      }))
    // Arg shapes: (bin, reader) | (bin, reader, permissive: bool) |
    // (bin, reader, writer: string) | (bin, reader, writer, permissive).
    // A STRING third argument is the writer schema (schema evolution:
    // bytes produced under the writer's schema resolve to the reader's —
    // the registry-evolution story, see AvroDecode scaladoc); a BOOLEAN
    // third argument is the permissive flag, as before.
    ext.injectFunction((
      new FunctionIdentifier("graft_from_avro"),
      new ExpressionInfo(
        classOf[AvroDecode].getName, null, "graft_from_avro",
        "graft_from_avro(binary, readerSchemaJson[, writerSchemaJson][, permissive]) - decode Avro binary to a struct",
        ""),
      (children: Seq[Expression]) => {
        require(children.length >= 2 && children.length <= 4,
          "graft_from_avro takes 2 to 4 arguments")
        def permissiveArg(e: Expression): Boolean = {
          require(e.foldable && e.dataType ==
            org.apache.spark.sql.types.BooleanType,
            "graft_from_avro: permissive must be a boolean literal")
          e.eval().asInstanceOf[Boolean]
        }
        val reader = schemaArg(children(1), "graft_from_avro")
        children.length match {
          case 2 => AvroDecode(children.head, reader, permissive = false)
          case 3 if children(2).dataType ==
              org.apache.spark.sql.types.BooleanType =>
            AvroDecode(children.head, reader, permissiveArg(children(2)))
          case 3 => AvroDecode(children.head, reader, permissive = false,
            Some(schemaArg(children(2), "graft_from_avro")))
          case _ => AvroDecode(children.head, reader,
            permissiveArg(children(3)),
            Some(schemaArg(children(2), "graft_from_avro")))
        }
      }))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SQL surface: registers the engine's scalar functions in the session
  * FunctionRegistry so `spark.sql` users get the same operators as the
  * Column API (SURVEY §2.11 — "a registered SQL function … if SQL parity is
  * desired"). Column-composition functions register by round-tripping
  * argument Expressions through the Column layer, so SQL and DataFrame
  * calls share one implementation. */
object GraftFunctions {

  private def viaColumns(f: Seq[Column] => Column)(es: Seq[Expression]): Expression =
    ColumnBridge.expression(f(es.map(ColumnBridge.column)))

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def register(name: String, arity: Int, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => {
        require(es.length == arity,
          s"$name expects $arity argument(s), got ${es.length}")
        builder(es)
      }, "scala_udf")

    register("haversine_m", 4, viaColumns { cs =>
      SpatialFunctions.haversineMeters(cs(0), cs(1), cs(2), cs(3))
    })
    register("seconds_since_midnight", 1, viaColumns { cs =>
      TimeFunctions.secondsSinceMidnight(cs(0))
    })
    register("simhash64", 1, es =>
      graft.functions.expressions.SimHash64Expr(es.head))
    register("minhash_signature", 2, es => {
      // k must be a foldable literal in SQL: minhash_signature(arr, 16)
      val k = es(1).eval().asInstanceOf[Number].intValue()
      graft.functions.expressions.MinHashSignatureExpr(es.head, k)
    })
    register("dot_product", 2, es =>
      graft.functions.expressions.DotProductExpr(es(0), es(1)))
    register("jaccard_sorted", 2, es =>
      graft.functions.expressions.JaccardSortedExpr(es(0), es(1)))
    register("lang_id", 1, es =>
      graft.functions.expressions.LangScoreExpr(es.head,
        TextFunctions.stopwords.toSeq.sortBy(_._1)))
  }
}

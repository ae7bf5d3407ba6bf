package graft

import graft.functions.CosineSimilarity
import graft.parse.JsonFindNumbers
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions mounting the engine's custom Catalyst pieces.
  * Enable with .config("spark.sql.extensions", "graft.GraftExtensions").
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(JsonFindNumbers.fnName),
      new ExpressionInfo(classOf[JsonFindNumbers].getName, JsonFindNumbers.fnName),
      (exprs: Seq[Expression]) => JsonFindNumbers(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier(CosineSimilarity.fnName),
      new ExpressionInfo(classOf[CosineSimilarity].getName, CosineSimilarity.fnName),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(graft.functions.LshSignature.fnName),
      new ExpressionInfo(classOf[graft.functions.LshSignature].getName, graft.functions.LshSignature.fnName),
      (exprs: Seq[Expression]) => graft.functions.LshSignature(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier(graft.functions.SimHash64.fnName),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, graft.functions.SimHash64.fnName),
      (exprs: Seq[Expression]) => graft.functions.SimHash64(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier(graft.functions.WordShingles.fnName),
      new ExpressionInfo(classOf[graft.functions.WordShingles].getName, graft.functions.WordShingles.fnName),
      (exprs: Seq[Expression]) => graft.functions.WordShingles(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(graft.functions.TopKCount.fnName),
      new ExpressionInfo(classOf[graft.functions.TopKCount].getName, graft.functions.TopKCount.fnName),
      (exprs: Seq[Expression]) => graft.functions.TopKCount(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier(graft.functions.TopKSum.fnName),
      new ExpressionInfo(classOf[graft.functions.TopKSum].getName, graft.functions.TopKSum.fnName),
      (exprs: Seq[Expression]) => graft.functions.TopKSum(exprs(0), exprs(1), exprs(2), exprs(3))))
  }
}

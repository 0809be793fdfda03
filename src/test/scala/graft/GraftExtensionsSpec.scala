package graft

import org.apache.spark.sql.{GraftExtensionsBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects graft_dot into a session's function registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = GraftExtensionsBridge.applyTo(
      ext, FunctionRegistry.builtin.clone())
    assert(registry.functionExists(FunctionIdentifier("graft_dot")))
    val expr = registry.lookupFunction(
      FunctionIdentifier("graft_dot"),
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
            Array(1.0, 2.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            Array(3.0, 4.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))))
    assert(expr.isInstanceOf[graft.expressions.DotProduct])
    assert(expr.eval(null) == 11.0)
  }

  test("GraftExtensions injects every registered graft function") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = GraftExtensionsBridge.applyTo(
      ext, FunctionRegistry.builtin.clone())
    graft.expressions.GraftFunctions.all.foreach { case (id, _, _) =>
      assert(registry.functionExists(id), s"missing injected function: $id")
    }
  }
}

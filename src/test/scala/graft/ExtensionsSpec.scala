package graft

/** The `spark.sql.extensions` deployment path: GraftExtensions carries the
  * same function descriptions `injectFunction` hands the FunctionRegistry
  * at session build. The shared-session suite can't rebuild the session
  * with a conf-driven extension, so the spec registers THROUGH the
  * extension's own builder tuples and exercises the functions from pure
  * SQL — exactly the surface a Thrift/JDBC client of an extension-loaded
  * cluster sees — and separately proves the class is instantiable the way
  * Spark's reflective loader requires (public, no-arg, Extensions => Unit).
  */
class ExtensionsSpec extends SparkSpec {

  test("extension function descriptions answer through pure SQL") {
    GraftExtensions.functions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "built-in")
    }
    val row = spark.sql(
      """SELECT farm_fingerprint('abc') AS f,
        |  vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |          array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d""".stripMargin)
      .collect().head
    assert(row.getAs[Long]("f") === 2640714258260161385L)   // BigQuery parity vector
    assert(row.getAs[Double]("d") === 4.0)
  }

  test("extension class loads the way spark.sql.extensions instantiates it") {
    val inst = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
    // type erasure makes isInstanceOf[SparkSessionExtensions => Unit]
    // vacuous — actually APPLY it to a fresh extensions object, which is
    // exactly what Spark's loader does (throws if the function type lies)
    inst.asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("wrong arity is a clear analysis error, not an index crash") {
    GraftExtensions.functions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "built-in")
    }
    val e1 = intercept[Exception](spark.sql("SELECT farm_fingerprint('a', 'b')").collect())
    assert(e1.getMessage.contains("farm_fingerprint"))
    val e2 = intercept[Exception](spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)))").collect())
    assert(e2.getMessage.contains("vec_dot"))
  }
}

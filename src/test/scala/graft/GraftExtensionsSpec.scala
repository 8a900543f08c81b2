package graft

import org.apache.spark.sql.functions._

/** Custom expressions exposed as SQL functions via
  * SparkSessionExtensions. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product and hamming callable from SQL") {
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f), "0101", "0001"))
      .toDF("a", "b", "h1", "h2")
      .createOrReplaceTempView("vt")
    val row = spark.sql(
      "SELECT dot_product(a, b) AS d, hamming(h1, h2) AS h FROM vt").head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getInt(1) == 1)
  }

  test("dot_product rejects non-array inputs with a clear analysis error") {
    Seq((1, "x")).toDF("n", "s").createOrReplaceTempView("bad")
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product(n, s) FROM bad").collect()
    }
    assert(e.getMessage.contains("dot_product") || e.getMessage.contains("DATATYPE"))
  }
}

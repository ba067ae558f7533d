package graft

import org.apache.spark.sql.types._

import graft.operators.OmeOps
import graft.schema.{Fixtures, OmeSchema}

/** Schema conformance matchers (reference: utils.py:10-27,
  * ingest.py:872-912). */
class SchemaSpec extends SparkSpec {

  test("conftest record matches lenient and strict") {
    val df = Fixtures.conftestDf(spark)
    assert(OmeOps.verifySchema(df))
    assert(OmeOps.verifySchema(df, strict = true))
  }

  test("detectOmeColumns finds the struct column under any name") {
    val df = Fixtures.conftestDf(spark).withColumnRenamed("ome_arrow", "image")
    assert(OmeOps.detectOmeColumns(df) === Seq("image"))
  }

  test("non-OME tables yield no detections") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(OmeOps.detectOmeColumns(docs).isEmpty)
    assert(!OmeOps.verifySchema(docs, column = "text"))
  }

  test("extra masks field tolerated in lenient and strict") {
    val withMasks = StructType(OmeSchema.omeArrowType.fields :+
      StructField("masks", BinaryType))
    assert(OmeSchema.fieldSetMatches(withMasks))
    assert(OmeSchema.strictMatches(withMasks))
  }

  test("missing field fails the lenient matcher") {
    val missing = StructType(OmeSchema.omeArrowType.fields.filterNot(_.name == "planes"))
    assert(!OmeSchema.fieldSetMatches(missing))
  }

  test("wrong nested type passes lenient, fails strict") {
    val renamedType = OmeSchema.omeArrowType.fields.map {
      case f if f.name == "version" => f.copy(dataType = IntegerType)
      case f => f
    }
    val dt = StructType(renamedType)
    assert(OmeSchema.fieldSetMatches(dt))
    assert(!OmeSchema.strictMatches(dt))
  }
}

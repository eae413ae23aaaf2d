package graft.exprs

import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.{Column, SparkSession}

/** Column-level API over the custom expressions, plus SQL registration. */
object functions {
  def minify_json(c: Column): Column =
    Shim.column(MinifyJson(Shim.expression(c)))

  def payload_is_valid(c: Column): Column =
    Shim.column(PayloadIsValid(Shim.expression(c)))

  def label_is_valid(c: Column): Column =
    Shim.column(LabelIsValid(Shim.expression(c)))

  def event_checksum(
      timestamp: Column,
      label: Column,
      payload: Column,
      versionPrevious: Column): Column =
    Shim.column(EventChecksum(
      Shim.expression(timestamp),
      Shim.expression(label),
      Shim.expression(payload),
      Shim.expression(versionPrevious)))

  def dot_product(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))

  def parse_hex_version(c: Column): Column =
    Shim.column(ParseHexVersion(Shim.expression(c)))

  def hex_version(c: Column): Column =
    Shim.column(HexVersion(Shim.expression(c)))

  /** Register all custom expressions for spark.sql(...) use. */
  def registerAll(spark: SparkSession): Unit = {
    Shim.register(spark, "minify_json", es => MinifyJson(es.head))
    Shim.register(spark, "payload_is_valid", es => PayloadIsValid(es.head))
    Shim.register(spark, "label_is_valid", es => LabelIsValid(es.head))
    Shim.register(spark, "event_checksum",
      es => EventChecksum(es(0), es(1), es(2), es(3)))
    Shim.register(spark, "parse_hex_version", es => ParseHexVersion(es.head))
    Shim.register(spark, "dot_product", es => DotProduct(es(0), es(1)))
    Shim.register(spark, "hex_version", es => HexVersion(es.head))
  }
}

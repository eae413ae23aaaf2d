package graft.exprs

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Install the engine's expressions through the standard extensions hook:
  *
  *   spark.sql.extensions=graft.exprs.GraftExtensions
  *
  * makes `minify_json`, `event_checksum`, `dot_product`, … available to
  * pure-SQL sessions (spark-sql, Thrift server, notebooks) without any
  * driver code. The same builders back [[functions.registerAll]] for
  * sessions that already exist.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  /** name -> expression builder, the single registry both paths share. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minify_json" -> (es => MinifyJson(es.head)),
    "payload_is_valid" -> (es => PayloadIsValid(es.head)),
    "label_is_valid" -> (es => LabelIsValid(es.head)),
    "event_checksum" -> (es => EventChecksum(es(0), es(1), es(2), es(3))),
    "parse_hex_version" -> (es => ParseHexVersion(es.head)),
    "hex_version" -> (es => HexVersion(es.head)),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "winnow_fps" -> (es => WinnowFingerprints(es.head)),
    "simhash32" -> (es => SimHash32(es.head)),
    "ngram_shingles" -> (es => NgramShingles(es.head)),
    "minhash12" -> (es => Minhash12(es.head)),
    "token_stats" -> (es => TokenStats(es(0), es(1), es(2))),
    "repetition_stats" -> (es => RepetitionStats(es.head)),
    "zorder16" -> (es => ZOrder16(es(0), es(1))))
}

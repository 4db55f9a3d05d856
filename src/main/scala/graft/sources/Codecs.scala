package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source-codec registry with extension-based format inference — the
  * recast of grafter's format registry / sniffing
  * (/root/reference/grafter.io/src/grafter_2/rdf4j/formats.clj:35-101,
  * 122-147) for lake-native formats: the change feed is parquet or JSONL
  * (+ CSV/TSV for sideloads), selected by explicit format → extension
  * sniff → error, the reference's `resolve-format-preference` order
  * (io.clj:469-483). The registry is open (mutable) in the reference's
  * multimethod style: an entry maps an extension to a Spark DataSource
  * short name plus default options.
  */
object Codecs {
  final case class Codec(sparkFormat: String, defaults: Map[String, String] = Map.empty)

  val registry: mutable.Map[String, Codec] = mutable.Map(
    "parquet" -> Codec("parquet"),
    "jsonl" -> Codec("json"),
    "json" -> Codec("json"),
    "csv" -> Codec("csv", Map("header" -> "true")),
    "tsv" -> Codec("csv", Map("header" -> "true", "sep" -> "\t")))

  /** Extension sniff over a path, URL, or directory of uniform files —
    * the reference's URL/path resolve-with-fallback (io.clj:686-713):
    * `file:` URLs resolve to their path; other URL schemes sniff the URL's
    * file extension directly (the transport itself is out of scope for a
    * lake-native engine, but format inference must not choke on a URL).
    */
  def infer(path: String): Option[String] = {
    val local = path match {
      case u if u.startsWith("file:") =>
        // opaque file: URIs (no slashes) have a null getPath — fall back
        // to stripping the scheme rather than NPE-ing
        Option(java.net.URI.create(u).getPath).getOrElse(u.stripPrefix("file:"))
      case u if u.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.*") =>
        // non-file URL: sniff the last path segment's extension, no I/O
        return u.split('?').head.split('/').lastOption
          .flatMap(_.split('.').drop(1).lastOption)
          .map(_.toLowerCase).filter(registry.contains)
      case u => u
    }
    val p = java.nio.file.Paths.get(local)
    val name =
      if (java.nio.file.Files.isDirectory(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(p).iterator().asScala
          .map(_.getFileName.toString)
          .find(n => !n.startsWith("_") && !n.startsWith(".") && n.contains("."))
          .getOrElse("")
      } else p.getFileName.toString
    name.split('.').drop(1).lastOption.map(_.toLowerCase)
      .filter(registry.contains)
  }

  private def resolve(path: String, format: Option[String]): Codec = {
    val fmt = format.orElse(infer(path)).getOrElse(
      throw new IllegalArgumentException(
        s"cannot infer feed format for $path; known: ${registry.keys.mkString(",")}"))
    registry.getOrElse(fmt,
      throw new IllegalArgumentException(s"unknown feed format $fmt"))
  }

  def read(spark: SparkSession, path: String, schema: StructType,
           format: Option[String] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val c = resolve(path, format)
    spark.read.schema(schema).options(c.defaults ++ options)
      .format(c.sparkFormat).load(path)
  }

  def readStream(spark: SparkSession, path: String, schema: StructType,
                 format: Option[String] = None,
                 options: Map[String, String] = Map.empty): DataFrame = {
    val c = resolve(path, format)
    spark.readStream.schema(schema).options(c.defaults ++ options)
      .format(c.sparkFormat).load(path)
  }
}

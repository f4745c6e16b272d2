package graft.model

/** Canonical series-name codec: `metric tag1=v1 tag2=v2`, tags sorted by
  * name, single-space separated (reference:
  * libakumuli/index/seriesparser.cpp:389 `to_canonical_form`). Event series
  * are metrics starting with `!` (reference:
  * libakumuli/query_processing/queryparser.cpp:308-336).
  */
final case class SeriesKey(metric: String, tags: Map[String, String]) {
  def isEvent: Boolean = metric.startsWith("!")
  def canonical: String =
    (metric +: tags.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" })
      .mkString(" ")
}

object SeriesKey {
  val MaxTags = 32   // reference: include/akumuli_def.h:116
  val MaxName = 4096 // reference: include/akumuli_def.h:118

  /** Parse `metric tag=v ...`; requires >=1 well-formed tag and no
    * duplicate tag names, like the reference parser. */
  def parse(s: String): Either[String, SeriesKey] = {
    if (s.length > MaxName) return Left("series name too long")
    val parts = s.trim.split("\\s+").toSeq
    if (parts.size < 2) return Left(s"at least one tag required: '$s'")
    val metric = parts.head
    val kvs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (p <- parts.tail) {
      val i = p.indexOf('=')
      if (i <= 0 || i == p.length - 1) return Left(s"ill-formed tag '$p'")
      kvs += (p.substring(0, i) -> p.substring(i + 1))
    }
    if (kvs.size > MaxTags) return Left("too many tags")
    if (kvs.map(_._1).distinct.size != kvs.size)
      return Left(s"duplicate tags: '$s'")
    Right(SeriesKey(metric, kvs.toMap))
  }
}

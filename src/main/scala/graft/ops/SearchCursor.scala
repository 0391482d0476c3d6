package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import java.util.Base64
import java.nio.charset.StandardCharsets

/** Keyset-pagination cursor codec + page builder, ≅ the reference's
  * FullSearchCursor (/root/reference/mcrit/index/SearchCursor.py:87-107,
  * orchestrated at /root/reference/mcrit/index/MinHashIndex.py:510-562):
  * a cursor is the (field, direction)-list plus the boundary row's sort
  * values, base64-encoded; it decodes into the OR-of-ANDs keyset predicate
  *
  *   (f1 > v1) OR (f1 = v1 AND f2 > v2) OR … (directions per field)
  *
  * which pushes down to the scan as a plain filter — no OFFSET scans at any
  * depth. `page` returns forward AND backward cursors so clients can walk
  * both ways.
  */
object SearchCursor {

  final case class SortField(name: String, ascending: Boolean)

  /** A decoded cursor: the sort spec, the boundary values (stringified, with
    * their type tags), and the paging direction.
    */
  final case class Cursor(fields: Seq[SortField], types: Seq[String],
      values: Seq[String], forward: Boolean)

  // ---- codec -----------------------------------------------------------

  // ':' must be escaped too: it is the entry separator, and while values are
  // protected by decode's bounded split(":", 4), FIELD NAMES are not — an
  // unescaped ':' in a field name would shift every later field over.
  private def esc(s: String): String =
    s.replace("%", "%25").replace("|", "%7C").replace(":", "%3A")
  private def unesc(s: String): String =
    s.replace("%7C", "|").replace("%3A", ":").replace("%25", "%")

  def encode(c: Cursor): String = {
    val body = (Seq(if (c.forward) "F" else "B") ++
      c.fields.zip(c.types).zip(c.values).map { case ((f, t), v) =>
        s"${esc(f.name)}:${if (f.ascending) "a" else "d"}:$t:${esc(v)}"
      }).mkString("|")
    Base64.getUrlEncoder.withoutPadding.encodeToString(body.getBytes(StandardCharsets.UTF_8))
  }

  def decode(s: String): Cursor = {
    val body = new String(Base64.getUrlDecoder.decode(s), StandardCharsets.UTF_8)
    val parts = body.split('|')
    require(parts.nonEmpty && (parts.head == "F" || parts.head == "B"),
      "malformed cursor: missing direction")
    val entries = parts.tail.map { p =>
      // value (4th field) may itself contain ':' — bounded split
      val fs = p.split(":", 4)
      require(fs.length == 4, s"malformed cursor entry: $p")
      (SortField(unesc(fs(0)), fs(1) == "a"), fs(2), unesc(fs(3)))
    }
    Cursor(entries.map(_._1).toSeq, entries.map(_._2).toSeq, entries.map(_._3).toSeq,
      forward = parts.head == "F")
  }

  private def typed(t: String, v: String): Any = t match {
    case "l" => v.toLong
    case "d" => v.toDouble
    case _ => v
  }

  /** NULL boundary values carry their own type tag ("n"): stringifying
    * them would produce the literal "null", which either crashes typed()
    * (numeric fields) or silently compares against the string 'null'. */
  private val NullTag = "n"

  private def typeTag(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType => "l"
    case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType => "d"
    case _ => "s"
  }

  // ---- predicate tree (SearchCursor.toTree analog) ----------------------

  /** The OR-of-ANDs keyset predicate for this cursor. For backward paging
    * every field's effective direction flips (walk the total order the
    * other way); rows are re-reversed after the fetch by `page`.
    */
  def predicate(c: Cursor): Column = {
    // Spark sort ordering: ascending → NULLS FIRST, descending → NULLS
    // LAST. The keyset predicate must walk the SAME total order, so null
    // boundaries and the null tail get explicit branches:
    //  - eq prefix on a null boundary: col IS NULL (=== null is never true)
    //  - "after null" in effective-asc (nulls first): every non-null row
    //  - "after null" in effective-desc (nulls last): nothing
    //  - "after v" in effective-desc: col < v OR col IS NULL (the null
    //    tail sorts after every value)
    val branches = c.fields.indices.map { i =>
      val eqs = (0 until i).map { j =>
        if (c.types(j) == NullTag) col(c.fields(j).name).isNull
        else col(c.fields(j).name) === lit(typed(c.types(j), c.values(j)))
      }
      val f = c.fields(i)
      val effAsc = f.ascending == c.forward
      val cmp =
        if (c.types(i) == NullTag) {
          if (effAsc) col(f.name).isNotNull else lit(false)
        } else {
          val v = lit(typed(c.types(i), c.values(i)))
          if (effAsc) col(f.name) > v
          else col(f.name) < v || col(f.name).isNull
        }
      (eqs :+ cmp).reduce(_ && _)
    }
    branches.reduce(_ || _)
  }

  /** One page of results. Applies the cursor predicate (if any), sorts in
    * effective direction, fetches limit+1 to detect more pages, restores
    * user order for backward pages, and emits forward/backward cursors from
    * the boundary rows.
    *
    * Returns (rows, nextCursor, prevCursor) — cursors are None at the
    * corresponding end of the result set.
    */
  def page(df: DataFrame, fields: Seq[SortField], cursor: Option[String],
      limit: Int): (Array[Row], Option[String], Option[String]) = {
    val dec = cursor.map(decode)
    val forward = dec.forall(_.forward)
    val filtered = dec match {
      case Some(c) => df.where(predicate(c))
      case None => df
    }
    val effOrder = fields.map(f =>
      if (f.ascending == forward) col(f.name).asc else col(f.name).desc)
    val fetched = filtered.orderBy(effOrder: _*).limit(limit + 1).collect()
    val hasMore = fetched.length > limit
    val pageRowsEff = fetched.take(limit)
    // backward pages come out reversed relative to user order
    val rows = if (forward) pageRowsEff else pageRowsEff.reverse

    val schema = df.schema
    def cursorFrom(row: Row, fwd: Boolean): String = {
      // per-row tags: a null boundary value gets the "n" tag (its real type
      // tag would stringify to the ambiguous literal "null")
      val tagsAndValues = fields.map { f =>
        row.getAs[Any](f.name) match {
          case null => (NullTag, "")
          case v => (typeTag(schema(f.name).dataType), String.valueOf(v))
        }
      }
      encode(Cursor(fields, tagsAndValues.map(_._1), tagsAndValues.map(_._2), forward = fwd))
    }

    if (rows.isEmpty) (rows, None, None)
    else {
      // next exists if paging forward saw limit+1 rows, or we came backward
      // (the rows we skipped past are ahead of us); symmetric for prev
      val next =
        if ((forward && hasMore) || !forward) Some(cursorFrom(rows.last, fwd = true))
        else None
      val prev =
        if ((!forward && hasMore) || (forward && cursor.isDefined))
          Some(cursorFrom(rows.head, fwd = false))
        else None
      (rows, next, prev)
    }
  }
}

package graft.parse

import java.time.LocalDate

/** The condition mini-language of the reference's `Condition` column
  * (SURVEY.md §2.3; /root/reference/Configurable_ETL_Python.py:108-129
  * dispatch, :131-200 forms, :59-106 literal wrappers).
  *
  * Grammar (dispatch by substring scan, priority order mirrors the
  * reference exactly):
  *   cond      := conj | disj | term
  *   conj      := term '&' cond              (n terms fold right)
  *   disj      := term '|' cond
  *   term      := between | single
  *   between   := col 'BETWEEN' '(' lit ',' lit ')'
  *   single    := col ('=' | '>=' | '<=') rhs
  *   rhs       := 'NOT NULL' | lit
  *   lit       := 'DATE(' yyyy-mm-dd ')' | 'NUMBER(' num ')'
  *              | 'BOOLEAN(' bool ')' | string        (unquoted, trimmed)
  *
  * The parser is pure (no Spark types) so it can be property-tested;
  * compilation to Catalyst `Column`s lives in [[graft.ops.Compile]].
  */
object Conditions {

  sealed trait Lit
  final case class SLit(v: String) extends Lit
  final case class NLit(v: Double) extends Lit
  final case class DLit(v: LocalDate) extends Lit
  final case class BLit(v: Boolean) extends Lit

  sealed trait Cond
  /** op is one of "=", ">=", "<=" */
  final case class Cmp(col: String, op: String, lit: Lit) extends Cond
  final case class NotNull(col: String) extends Cond
  final case class And(l: Cond, r: Cond) extends Cond
  final case class Or(l: Cond, r: Cond) extends Cond
  final case class Between(col: String, lo: Lit, hi: Lit) extends Cond

  final case class ParseError(msg: String) extends RuntimeException(msg)

  /** Literal wrappers — Configurable_ETL_Python.py:93-106. An
    * unwrapped RHS is a STRING, never coerced (SURVEY.md §7.4 #3).
    */
  def parseLit(raw: String): Lit = {
    val s = raw.trim
    val date = """(?i)DATE\((.+)\)""".r
    val num = """(?i)NUMBER\((.+)\)""".r
    val bool = """(?i)BOOLEAN\((.+)\)""".r
    s match {
      case date(d) =>
        try DLit(LocalDate.parse(d.trim)) // yyyy-mm-dd, the observed format
        catch {
          case e: java.time.format.DateTimeParseException =>
            // the module's error contract is ParseError — a leaked
            // DateTimeParseException would bypass interpreter handlers
            throw ParseError(s"bad DATE literal '$s' (want yyyy-mm-dd): ${e.getMessage}")
        }
      case num(n) =>
        try NLit(n.trim.toDouble)
        catch {
          case _: NumberFormatException =>
            throw ParseError(s"bad NUMBER literal '$s'")
        }
      case bool(b) =>
        BLit(b.trim.equalsIgnoreCase("true"))
      case other => SLit(other)
    }
  }

  /** Parse one `col <op> rhs` term. `NOT NULL` RHS is the reference's
    * spelled-as-equality null test (Configurable_ETL_Python.py:160-162).
    */
  private def parseSingle(s: String): Cond = {
    // >=, <= before = (the reference checks in this order too)
    def split(op: String): Option[(String, String)] = {
      val i = s.indexOf(op)
      if (i < 0) None else Some((s.substring(0, i).trim, s.substring(i + op.length).trim))
    }
    split(">=").map { case (c, r) => Cmp(c, ">=", parseLit(r)) }
      .orElse(split("<=").map { case (c, r) => Cmp(c, "<=", parseLit(r)) })
      .orElse(split("=").map { case (c, r) =>
        if (r.trim.equalsIgnoreCase("NOT NULL")) NotNull(c)
        else Cmp(c, "=", parseLit(r))
      })
      .getOrElse(throw ParseError(s"unparseable condition term: '$s'"))
  }

  private def parseBetween(s: String): Cond = {
    val re = """(?is)^\s*(.+?)\s+BETWEEN\s*\(\s*(.+?)\s*,\s*(.+?)\s*\)\s*$""".r
    s match {
      case re(col, lo, hi) => Between(col.trim, parseLit(lo), parseLit(hi))
      case _ => throw ParseError(s"unparseable BETWEEN: '$s'")
    }
  }

  /** One conjunct/disjunct: the same BETWEEN-then-single dispatch the
    * top level applies to an operator-free condition — so a BETWEEN
    * term is legal on EITHER side of '&'/'|', not only as the final
    * remainder.
    */
  private def parseTerm(s: String): Cond =
    if (s.toUpperCase.contains("BETWEEN")) parseBetween(s) else parseSingle(s)

  /** Full condition parser. Priority: & → | → BETWEEN → single
    * (matching handling_filter_operation's substring dispatch,
    * Configurable_ETL_Python.py:108-129).
    *
    * DELIBERATE DIVERGENCE (recorded in SURVEY §4): the reference's
    * filter_two_parts restricts `&`/`|` terms to raw-string equality
    * ('a = NUMBER(5)' compares the literal string "NUMBER(5)"), and
    * silently drops a third `&`-term. We parse each side with the full
    * single-term grammar (typed literals, >=/<=, NOT NULL) — a strict
    * superset that treats the reference behavior as a bug, not a spec.
    */
  def parse(s: String): Cond = {
    val t = s.trim
    if (t.isEmpty) throw ParseError("empty condition")
    else if (t.contains("&")) {
      // RECURSE on the remainder: with parseSingle there, a third term
      // of 'a = 1 & b = 2 & c = 3' would be absorbed into term two's
      // string literal (comparing b against "2 & c = 3" — matches
      // nothing, silently). n-term conjunctions fold right-associative
      val parts = t.split("&", 2)
      And(parseTerm(parts(0)), parse(parts(1)))
    } else if (t.contains("|")) {
      val parts = t.split("\\|", 2)
      Or(parseTerm(parts(0)), parse(parts(1)))
    } else parseTerm(t)
  }
}

/** `key=value` list grammars used by the non-filter operators
  * (SORT DATASET, GROUPBY SUMMARISE, ATTACH COLUMN, ADD COLUMN,
  * DECISION COLUMN, GROUPBY SLICE — SURVEY.md §2.5-§2.7). Pair
  * separator varies by op (',' or '|'); values may hold ','/'#'
  * sub-lists, split by the caller.
  */
object KvList {
  /** Split "k1=v1 <sep> k2=v2" into an ordered key→value map
    * (ListMap preserves insertion order — positional grammars like
    * ATTACH COLUMN's 5-part form rely on it).
    */
  def parse(s: String, pairSep: Char): Map[String, String] =
    scala.collection.immutable.ListMap.from(
      s.split(pairSep).iterator
        .map(_.trim)
        .filter(_.nonEmpty)
        .map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"bad key=value pair: '$kv'")
          kv.substring(0, i).trim -> kv.substring(i + 1).trim
        })

  /** Like [[parse]], but a segment WITHOUT '=' is folded back into the
    * previous pair's value — so `group_by_cols=a,b, slice_num=2`
    * parses as {group_by_cols → "a,b", slice_num → "2"}. The reference
    * mis-parses these multi-valued keys (groupby_slice/sort_dataset,
    * Configurable_ETL_Python.py:67-91 index past the split); we
    * implement the evident intent (divergence noted in SURVEY §4).
    */
  def parseLenient(s: String, pairSep: Char = ','): Map[String, String] = {
    val segs = s.split(pairSep).iterator.map(_.trim).filter(_.nonEmpty).toSeq
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    segs.foreach { seg =>
      val i = seg.indexOf('=')
      if (i > 0) pairs += seg.substring(0, i).trim -> seg.substring(i + 1).trim
      else {
        require(pairs.nonEmpty, s"dangling segment '$seg' in '$s'")
        val (k, v) = pairs.last
        // rejoin with the SAME separator the split consumed — a
        // hardcoded ',' would corrupt a folded value under the '|'
        // grammar (GROUPBY SUMMARISE)
        pairs(pairs.length - 1) = k -> s"$v$pairSep$seg"
      }
    }
    scala.collection.immutable.ListMap.from(pairs)
  }

  /** Parse "a,b,c" into a trimmed list. */
  def csv(s: String): Seq[String] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Parse "col#fn, col2#fn2" into (col, fn) pairs (GROUPBY SUMMARISE
    * grammar, Configurable_ETL_Python.py:346-357). '|' is accepted as
    * a pair separator too: [[parseLenient]] under the '|' grammar
    * folds a dangling "b#max" segment back with '|', so the value this
    * function receives may be '|'-joined — neither col names nor fn
    * names can contain either character.
    */
  def hashPairs(s: String): Seq[(String, String)] =
    s.split("[,|]").iterator.map(_.trim).filter(_.nonEmpty).toSeq.map { p =>
      val parts = p.split("#", 2)
      require(parts.length == 2, s"bad col#fn pair: '$p'")
      (parts(0).trim, parts(1).trim)
    }
}

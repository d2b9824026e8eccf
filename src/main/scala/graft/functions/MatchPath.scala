package graft.functions

import scala.collection.mutable.{ArrayDeque, ListBuffer}

/** MatchPath-style sequence matching (reference: Hive
  * `[exec!ql/udf/ptf/MatchPath.class]`, the `matchpath` PTF): find
  * occurrences of a symbol pattern inside an ordered event stream.
  *
  * Pattern syntax is MatchPath's dotted form, e.g. `"c.v+.p"` — one
  * symbol per step with an optional `+` (one-or-more) / `*`
  * (zero-or-more) quantifier. Matching is greedy, non-backtracking and
  * non-overlapping (leftmost scan, resume after each match) — for
  * patterns whose adjacent steps use distinct symbols this coincides
  * with regex `findall` semantics, which is what the DuckDB
  * `regexp_extract_all` oracle replays.
  *
  * The scanner is single-pass over an iterator and buffers only the
  * current candidate window (bounded by the match length, NOT the group
  * size) — the shape that survives million-event users at 100 TB when
  * driven by `flatMapSortedGroups` (Spark sorts each group via the
  * shuffle machinery; no per-group in-memory sort here).
  */
object MatchPath {
  sealed trait Quant
  case object One extends Quant
  case object Plus extends Quant
  case object Star extends Quant
  final case class Step(sym: Char, quant: Quant)

  /** Parse `"c.v+.p"` → compiled steps. */
  def compile(pattern: String): Seq[Step] =
    pattern.split('.').toSeq.filter(_.nonEmpty).map { tok =>
      tok.last match {
        case '+' => Step(tok.head, Plus)
        case '*' => Step(tok.head, Star)
        case _   => Step(tok.head, One)
      }
    }

  /** Scan `events` for non-overlapping matches. Returns
    * (startIndexInGroup, matchedEvents) in match order. */
  def scan[T](events: Iterator[T], symOf: T => Char,
      steps: Seq[Step]): Seq[(Int, Vector[T])] = {
    val out = ListBuffer.empty[(Int, Vector[T])]
    val window = ArrayDeque.empty[T]
    var pos = 0
    def ensure(n: Int): Boolean = {
      while (window.size < n && events.hasNext) window.append(events.next())
      window.size >= n
    }
    // greedy, non-backtracking attempt at the window head; match length or -1
    def tryMatch(): Int = {
      var i = 0
      steps.foreach { case Step(c, q) =>
        q match {
          case One =>
            if (!ensure(i + 1) || symOf(window(i)) != c) return -1
            i += 1
          case Plus =>
            if (!ensure(i + 1) || symOf(window(i)) != c) return -1
            i += 1
            while (ensure(i + 1) && symOf(window(i)) == c) i += 1
          case Star =>
            while (ensure(i + 1) && symOf(window(i)) == c) i += 1
        }
      }
      i
    }
    while (ensure(1)) {
      val len = tryMatch()
      if (len > 0) {
        out += ((pos, window.take(len).toVector))
        window.dropInPlace(len)
        pos += len
      } else {
        window.dropInPlace(1)
        pos += 1
      }
    }
    out.toSeq
  }
}

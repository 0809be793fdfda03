package graft.tsdb

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tag-filter DSL AST.
  *
  * Semantics follow the reference DSL (talna `src/query/filter.rs`,
  * `src/query/lexer.rs`): `tag:value`, prefix wildcard `tag:val*`,
  * `AND` / `OR` / `!`, parentheses, bare `*` = match all. Instead of
  * evaluating to posting lists of an inverted index, the AST compiles
  * to a Catalyst boolean [[Column]] so the predicate participates in
  * whole-stage codegen and is pushed into the parquet scan.
  */
sealed trait FilterNode
object FilterNode {
  final case class Eq(key: String, value: String) extends FilterNode
  final case class Wildcard(key: String, value: String) extends FilterNode
  final case class And(children: List[FilterNode]) extends FilterNode
  final case class Or(children: List[FilterNode]) extends FilterNode
  final case class Not(child: FilterNode) extends FilterNode
  case object AllStar extends FilterNode
}

object FilterParser {
  private sealed trait Tok
  private final case class Leaf(key: String, value: String, wildcard: Boolean) extends Tok
  private case object TAnd extends Tok
  private case object TOr extends Tok
  private case object TNot extends Tok
  private case object LPar extends Tok
  private case object RPar extends Tok

  private def lex(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LPar; i += 1 }
      else if (c == ')') { out += RPar; i += 1 }
      else if (c == '!') { out += TNot; i += 1 }
      else {
        val j0 = i
        while (i < s.length && !s.charAt(i).isWhitespace &&
               s.charAt(i) != '(' && s.charAt(i) != ')') i += 1
        s.substring(j0, i) match {
          case "AND" => out += TAnd
          case "OR"  => out += TOr
          case word =>
            val idx = word.indexOf(':')
            require(idx > 0 && idx < word.length - 1, s"invalid filter term: '$word'")
            val k = word.substring(0, idx)
            val v = word.substring(idx + 1)
            // reference lexer (talna src/query/lexer.rs) forbids ':' in values
            require(!v.contains(':'), s"invalid filter term: '$word'")
            if (v.endsWith("*")) out += Leaf(k, v.dropRight(1), wildcard = true)
            else out += Leaf(k, v, wildcard = false)
        }
      }
    }
    out.toList
  }

  /** Shunting-yard parse; precedence NOT > AND > OR (matches reference). */
  def parse(s: String): FilterNode = {
    if (s.trim == "*") return FilterNode.AllStar
    val output = scala.collection.mutable.ListBuffer.empty[Tok]
    val ops = scala.collection.mutable.Stack.empty[Tok]
    def prec(t: Tok): Int = t match {
      case TNot => 3; case TAnd => 2; case TOr => 1; case _ => 0
    }
    lex(s).foreach {
      case l: Leaf => output += l
      case TNot    => ops.push(TNot)
      case t @ (TAnd | TOr) =>
        while (ops.nonEmpty && ops.top != LPar && prec(ops.top) >= prec(t))
          output += ops.pop()
        ops.push(t)
      case LPar => ops.push(LPar)
      case RPar =>
        while (ops.nonEmpty && ops.top != LPar) output += ops.pop()
        require(ops.nonEmpty, s"unbalanced parens in filter: '$s'")
        ops.pop()
      case _ => ()
    }
    while (ops.nonEmpty) {
      require(ops.top != LPar, s"unbalanced parens in filter: '$s'")
      output += ops.pop()
    }
    val st = scala.collection.mutable.Stack.empty[FilterNode]
    output.foreach {
      case Leaf(k, v, false) => st.push(FilterNode.Eq(k, v))
      case Leaf(k, v, true)  => st.push(FilterNode.Wildcard(k, v))
      case TNot => val a = st.pop(); st.push(FilterNode.Not(a))
      case TAnd => val b = st.pop(); val a = st.pop(); st.push(FilterNode.And(List(a, b)))
      case TOr  => val b = st.pop(); val a = st.pop(); st.push(FilterNode.Or(List(a, b)))
      case _    => ()
    }
    require(st.size == 1, s"invalid filter: '$s'")
    st.pop()
  }

  /** Compile the AST to a boolean Column. `tag` resolves a tag key to its
    * column. Eq/Wildcard are null-safe (missing tag => false) so that NOT
    * matches the reference's complement-over-all-series semantics.
    */
  def compile(node: FilterNode, tag: String => Column): Column = node match {
    case FilterNode.AllStar        => lit(true)
    case FilterNode.Eq(k, v)       => coalesce(tag(k) === lit(v), lit(false))
    case FilterNode.Wildcard(k, v) => coalesce(tag(k).startsWith(v), lit(false))
    case FilterNode.And(cs)        => cs.map(compile(_, tag)).reduce(_ && _)
    case FilterNode.Or(cs)         => cs.map(compile(_, tag)).reduce(_ || _)
    case FilterNode.Not(c)         => !compile(c, tag)
  }

  def compileString(s: String, tag: String => Column): Column =
    compile(parse(s), tag)
}

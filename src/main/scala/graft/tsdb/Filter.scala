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

  // Reference lexer charset (talna src/query/lexer.rs:22-26):
  //   Identifier: [a-zA-Z_-]+ ':' [a-zA-Z0-9_\-.]+
  //   Wildcard:   [a-zA-Z_-]+ ':' [a-zA-Z0-9_\-.]* '*'   ('*' trailing only)
  private val IdentRe    = "([a-zA-Z_-]+):([a-zA-Z0-9_.-]+)".r
  private val WildcardRe = "([a-zA-Z_-]+):([a-zA-Z0-9_.-]*)\\*".r

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
          case "AND"                => out += TAnd
          case "OR"                 => out += TOr
          case WildcardRe(k, v)     => out += Leaf(k, v, wildcard = true)
          case IdentRe(k, v)        => out += Leaf(k, v, wildcard = false)
          // error span parity with the reference lexer (talna
          // src/query/parser/span.rs): the bad token's character
          // offset, so a malformed term in a long filter string is
          // locatable without scanning for the quoted text
          case word => throw new IllegalArgumentException(
            s"invalid filter term at offset $j0: '$word' (expected key:value " +
              "with key in [a-zA-Z_-], value in [a-zA-Z0-9_.-], " +
              "optional trailing '*')")
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
    // arity-guarded pops: a dangling operator ("a:1 AND", "!") must be
    // a clean reject, not an internal empty-stack error
    def pop1(op: String): FilterNode = {
      require(st.nonEmpty, s"invalid filter: '$s' (dangling $op)")
      st.pop()
    }
    output.foreach {
      case Leaf(k, v, false) => st.push(FilterNode.Eq(k, v))
      case Leaf(k, v, true)  => st.push(FilterNode.Wildcard(k, v))
      case TNot => val a = pop1("NOT"); st.push(FilterNode.Not(a))
      case TAnd => val b = pop1("AND"); val a = pop1("AND"); st.push(FilterNode.And(List(a, b)))
      case TOr  => val b = pop1("OR"); val a = pop1("OR"); st.push(FilterNode.Or(List(a, b)))
      case _    => ()
    }
    require(st.size == 1, s"invalid filter: '$s'")
    st.pop()
  }

  /** Compile the AST to a boolean Column. `tag` resolves a tag key to its
    * column. Eq/Wildcard are null-safe (missing tag => false, never NULL)
    * so that NOT matches the reference's complement-over-all-series
    * semantics — and they are written in pushdown-friendly forms:
    * `<=>` translates to a parquet EqualNullSafe predicate and
    * `isNotNull && startsWith` to IsNotNull + StringStartsWith, so tag
    * filters prune row groups at the scan instead of filtering
    * post-read (a `coalesce(..., false)` wrapper would be semantically
    * identical but blocks predicate pushdown entirely).
    */
  def compile(node: FilterNode, tag: String => Column): Column = node match {
    case FilterNode.AllStar        => lit(true)
    case FilterNode.Eq(k, v)       => tag(k) <=> lit(v)
    case FilterNode.Wildcard(k, v) => tag(k).isNotNull && tag(k).startsWith(v)
    case FilterNode.And(cs)        => cs.map(compile(_, tag)).reduce(_ && _)
    case FilterNode.Or(cs)         => cs.map(compile(_, tag)).reduce(_ || _)
    case FilterNode.Not(c)         => !compile(c, tag)
  }

  def compileString(s: String, tag: String => Column): Column =
    compile(parse(s), tag)
}

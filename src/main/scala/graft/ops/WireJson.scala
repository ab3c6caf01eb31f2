package graft.ops

/** Minimal JSON codec for the external-scorer wire boundary (HttpScoreFn
  * and its test server). Hand-rolled because the scorer transport runs
  * plain Scala on executors — no Spark Row machinery, and the build adds
  * no external dependencies. Numbers are kept as BigDecimal so 64-bit ids
  * round-trip exactly (a double-backed JSON number silently corrupts ids
  * above 2^53). */
object WireJson {

  sealed trait JVal {
    def apply(field: String): JVal = this match {
      case JObj(fields) =>
        fields.collectFirst { case (`field`, v) => v }
          .getOrElse(throw new NoSuchElementException(s"no field '$field' in $this"))
      case other => throw new IllegalArgumentException(s"not an object: $other")
    }
    def arr: Vector[JVal] = this match {
      case JArr(items) => items
      case other => throw new IllegalArgumentException(s"not an array: $other")
    }
    def num: BigDecimal = this match {
      case JNum(n) => n
      case other => throw new IllegalArgumentException(s"not a number: $other")
    }
    def str: String = this match {
      case JStr(s) => s
      case other => throw new IllegalArgumentException(s"not a string: $other")
    }
  }
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal
  final case class JArr(items: Vector[JVal]) extends JVal
  final case class JStr(value: String) extends JVal
  final case class JNum(value: BigDecimal) extends JVal
  final case class JBool(value: Boolean) extends JVal
  case object JNull extends JVal

  def obj(fields: (String, JVal)*): JObj = JObj(fields.toVector)
  def arr(items: Seq[JVal]): JArr = JArr(items.toVector)
  def num(l: Long): JNum = JNum(BigDecimal(l))
  def num(d: Double): JNum = JNum(BigDecimal(d))

  def render(v: JVal): String = {
    val sb = new StringBuilder
    def esc(s: String): Unit = {
      sb.append('"')
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"')
    }
    def go(v: JVal): Unit = v match {
      case JObj(fields) =>
        sb.append('{')
        var first = true
        fields.foreach { case (k, fv) =>
          if (!first) sb.append(',')
          first = false
          esc(k); sb.append(':'); go(fv)
        }
        sb.append('}')
      case JArr(items) =>
        sb.append('[')
        var first = true
        items.foreach { i =>
          if (!first) sb.append(',')
          first = false
          go(i)
        }
        sb.append(']')
      case JStr(s) => esc(s)
      case JNum(n) => sb.append(n.bigDecimal.toPlainString)
      case JBool(b) => sb.append(b)
      case JNull => sb.append("null")
    }
    go(v)
    sb.toString
  }

  /** Recursive-descent parser; throws IllegalArgumentException with the
    * offset on malformed input. */
  def parse(s: String): JVal = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"JSON parse error at $i: $msg")
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def pString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail("dangling escape")
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              if (i + 4 >= s.length) fail("short unicode escape")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => fail(s"bad escape '\\$other'")
          }
        } else sb.append(c)
        i += 1
      }
      expect('"')
      sb.toString
    }
    def pValue(): JVal = {
      ws()
      if (i >= s.length) fail("unexpected end")
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val fields = Vector.newBuilder[(String, JVal)]
          if (i < s.length && s.charAt(i) == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              ws()
              val k = pString()
              ws(); expect(':')
              fields += (k -> pValue())
              ws()
              if (i < s.length && s.charAt(i) == ',') i += 1
              else { expect('}'); more = false }
            }
          }
          JObj(fields.result())
        case '[' =>
          i += 1; ws()
          val items = Vector.newBuilder[JVal]
          if (i < s.length && s.charAt(i) == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              items += pValue()
              ws()
              if (i < s.length && s.charAt(i) == ',') i += 1
              else { expect(']'); more = false }
            }
          }
          JArr(items.result())
        case '"' => JStr(pString())
        case 't' => if (s.startsWith("true", i)) { i += 4; JBool(true) } else fail("bad literal")
        case 'f' => if (s.startsWith("false", i)) { i += 5; JBool(false) } else fail("bad literal")
        case 'n' => if (s.startsWith("null", i)) { i += 4; JNull } else fail("bad literal")
        case _ =>
          val start = i
          if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
          while (i < s.length && (s.charAt(i).isDigit || "eE+-.".contains(s.charAt(i)))) i += 1
          if (i == start) fail("bad value")
          JNum(BigDecimal(s.substring(start, i)))
      }
    }
    val v = pValue()
    ws()
    if (i != s.length) fail("trailing input")
    v
  }
}

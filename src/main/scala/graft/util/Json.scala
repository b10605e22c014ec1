package graft.util

import scala.collection.immutable.VectorMap
import scala.collection.mutable.ArrayBuffer

/** Tiny dependency-free JSON reader/writer.
  *
  * Used for: golden-file comparison against the reference corpus
  * (the .json goldens under /root/reference/shakespeare), the JSON sink
  * (reference WriteOutput.php:150-364), and Iceberg-style snapshot/manifest
  * metadata files. Objects preserve key order (VectorMap) because the
  * reference's PHP arrays are insertion-ordered.
  */
object Json {
  sealed trait Value {
    def asString: String = this.asInstanceOf[Str].s
    def asInt: Int = this match {
      case Num(n) => n.toInt
      case Str(s) => s.toInt
      case v      => sys.error(s"not a number: $v")
    }
    def asLong: Long = this match {
      case Num(n) => n.toLong
      case Str(s) => s.toLong
      case v      => sys.error(s"not a number: $v")
    }
    def asArray: Vector[Value] = this.asInstanceOf[Arr].items
    def asObject: VectorMap[String, Value] = this.asInstanceOf[Obj].fields
    def apply(key: String): Value = asObject(key)
    def get(key: String): Option[Value] = this match {
      case Obj(f) => f.get(key)
      case _      => None
    }
  }
  final case class Str(s: String) extends Value
  final case class Num(n: Double) extends Value
  final case class Bool(b: Boolean) extends Value
  case object Null extends Value
  final case class Arr(items: Vector[Value]) extends Value
  final case class Obj(fields: VectorMap[String, Value]) extends Value

  object Obj {
    def of(kvs: (String, Value)*): Obj = Obj(VectorMap(kvs: _*))
  }

  def parse(input: String): Value = new Parser(input).parseValue()

  private final class Parser(s: String) {
    private var i = 0
    private def ws(): Unit = {
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\n' ||
             s.charAt(i) == '\t' || s.charAt(i) == '\r')) i += 1
    }
    def parseValue(): Value = {
      ws()
      s.charAt(i) match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => Str(parseStr())
        case 't' => i += 4; Bool(true)
        case 'f' => i += 5; Bool(false)
        case 'n' => i += 4; Null
        case _   => parseNum()
      }
    }
    private def parseObj(): Obj = {
      i += 1; ws()
      val buf = new ArrayBuffer[(String, Value)]
      if (s.charAt(i) == '}') { i += 1; return Obj(VectorMap.empty) }
      var done = false
      while (!done) {
        ws()
        val k = parseStr()
        ws()
        require(s.charAt(i) == ':', s"expected ':' at $i"); i += 1
        val v = parseValue()
        buf += (k -> v)
        ws()
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case c   => sys.error(s"bad obj char '$c' at $i")
        }
      }
      Obj(VectorMap.from(buf))
    }
    private def parseArr(): Arr = {
      i += 1; ws()
      val buf = new ArrayBuffer[Value]
      if (s.charAt(i) == ']') { i += 1; return Arr(Vector.empty) }
      var done = false
      while (!done) {
        buf += parseValue()
        ws()
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; done = true
          case c   => sys.error(s"bad arr char '$c' at $i")
        }
      }
      Arr(buf.toVector)
    }
    private def parseStr(): String = {
      require(s.charAt(i) == '"', s"expected '\"' at $i")
      i += 1
      val sb = new java.lang.StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u'  =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case x => sb.append(x)
          }
        } else sb.append(c)
        i += 1
      }
      i += 1
      sb.toString
    }
    private def parseNum(): Num = {
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      Num(s.substring(start, i).toDouble)
    }
  }

  def write(v: Value): String = {
    val sb = new java.lang.StringBuilder
    writeTo(v, sb)
    sb.toString
  }

  def writeTo(v: Value, sb: java.lang.StringBuilder): Unit = v match {
    case Str(s)  => writeString(s, sb)
    case Num(n)  =>
      if (n == Math.floor(n) && !n.isInfinite && math.abs(n) < 1e15) sb.append(n.toLong)
      else sb.append(n)
    case Bool(b) => sb.append(b)
    case Null    => sb.append("null")
    case Arr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it => if (!first) sb.append(','); writeTo(it, sb); first = false }
      sb.append(']')
    case Obj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, x) =>
        if (!first) sb.append(',')
        writeString(k, sb); sb.append(':'); writeTo(x, sb)
        first = false
      }
      sb.append('}')
  }

  def writeString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case x if x < ' ' => sb.append(f"\\u${x.toInt}%04x")
        case x => sb.append(x)
      }
      i += 1
    }
    sb.append('"')
  }
}

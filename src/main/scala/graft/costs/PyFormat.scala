package graft.costs

/** CPython-compatible value rendering, so the report sinks are
  * byte-comparable with the reference CLI's output (Python's `repr(float)`
  * and `json.dumps(indent=2)` formatting — Java's `Double.toString` uses
  * different exponent-notation rules, e.g. `2.5E-5` vs `2.5e-05`).
  *
  * Both runtimes print the shortest digit string that round-trips, so the
  * significant digits agree; only the surface formatting is re-derived:
  * fixed notation for decimal exponent in [-4, 16), else scientific with a
  * sign and ≥2 exponent digits.
  */
object PyFormat {

  /** `repr(d)` for a finite double. */
  def pyFloat(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val sign = if (d < 0) "-" else ""
    val s = java.lang.Double.toString(math.abs(d))
    val (mant, exp) = s.split('E') match {
      case Array(m) => (m, 0)
      case Array(m, e) => (m, e.toInt)
    }
    val Array(intPart, fracPart) = mant.split("\\.", 2)
    val allDigits = intPart + fracPart
    val lead = allDigits.takeWhile(_ == '0').length
    // decimal exponent of the first significant digit
    val exp10 =
      if (intPart.exists(_ != '0')) exp + intPart.length - 1
      else exp - 1 - (fracPart.takeWhile(_ == '0').length)
    val sig0 = allDigits.drop(lead)
    val sig = sig0.reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case x => x
    }
    if (exp10 >= 16 || exp10 < -4) {
      val m = if (sig.length == 1) sig else s"${sig.head}.${sig.tail}"
      val es = (if (exp10 < 0) "-" else "+") + f"${math.abs(exp10)}%02d"
      s"$sign${m}e$es"
    } else if (exp10 >= 0) {
      if (sig.length > exp10 + 1)
        s"$sign${sig.take(exp10 + 1)}.${sig.drop(exp10 + 1)}"
      else s"$sign${sig.padTo(exp10 + 1, '0').mkString}.0"
    } else {
      s"${sign}0." + ("0" * (-exp10 - 1)) + sig
    }
  }

  // --- `json.dumps(..., indent=2)`-compatible pretty printer ---------------

  sealed trait PyJson
  final case class PyStr(v: String) extends PyJson
  final case class PyNum(v: Double) extends PyJson
  final case class PyInt(v: Long) extends PyJson
  final case class PyBool(v: Boolean) extends PyJson
  case object PyNull extends PyJson
  final case class PyArr(items: Seq[PyJson]) extends PyJson
  final case class PyObj(items: Seq[(String, PyJson)]) extends PyJson

  private def escape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Render like `json.dumps(value, indent=2)`. */
  def dumps(value: PyJson, indent: Int = 2): String = {
    def go(v: PyJson, level: Int): String = {
      val pad = " " * (indent * (level + 1))
      val close = " " * (indent * level)
      v match {
        case PyStr(s) => escape(s)
        case PyNum(d) => pyFloat(d)
        case PyInt(l) => l.toString
        case PyBool(b) => if (b) "true" else "false"
        case PyNull => "null"
        case PyArr(Seq()) => "[]"
        case PyArr(items) =>
          items.map(i => pad + go(i, level + 1))
            .mkString("[\n", ",\n", s"\n$close]")
        case PyObj(Seq()) => "{}"
        case PyObj(items) =>
          items.map { case (k, i) => s"$pad${escape(k)}: ${go(i, level + 1)}" }
            .mkString("{\n", ",\n", s"\n$close}")
      }
    }
    go(value, 0)
  }
}

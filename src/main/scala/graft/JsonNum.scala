package graft

/** Locale-pinned decimal formatting for MACHINE-PARSED JSON emitters
  * (Bench, StreamBench, ScaleProbe headlines and detail files): the `f`
  * interpolator formats through the JVM's default locale, and a
  * comma-decimal locale (de_DE, fr_FR, …) would turn `"t":1.234` into
  * the unparseable `"t":1,234. One shared helper so the class of bug is
  * fixed once, not per emitter.
  */
object JsonNum {
  def j(d: Double, precision: Int = 3): String =
    String.format(java.util.Locale.ROOT, s"%.${precision}f", Double.box(d))
}

package graft.core

/** Plan-time validation failure carrying *every* problem found, not just the
  * first — mirrors the reference's error accumulation where all missing
  * capabilities are reported in one typed exception (reference:
  * framework/ubw-core/src/main/scala/net/scalax/ubw/core/AtomicGen.scala:18-37,
  * AtomicException.scala:5-14).
  *
  * Only thrown in strict mode; lenient mode (the reference's observable
  * behavior) silently elides unresolvable requests
  * (reference: documentation/doc-01.md:148-152, doc-02.md:133).
  */
final case class GraftAnalysisException(errors: Seq[String])
    extends RuntimeException(
      s"query compilation failed with ${errors.size} error(s):\n  " +
        errors.mkString("\n  "))

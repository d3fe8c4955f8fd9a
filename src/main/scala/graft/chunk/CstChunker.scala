package graft.chunk

import scala.collection.mutable.ArrayBuffer

import graft.model.{Boundary, ChunkPiece}

/** Structural (CST-level) code chunker — the C4 semantics of the
  * reference's tree-sitter pipeline (`src/core/chunk/cst-operations.ts`
  * + the per-language boundary inventory of
  * `src/core/chunk/language-node-types.ts:6-126`), reproduced with
  * deterministic block scanning instead of a native tree-sitter
  * runtime (a platform-binary dependency this offline JVM build cannot
  * carry; the scanner needs no parser and gives the same boundary
  * inventory on well-formed sources).
  *
  * Reference semantics preserved:
  *   - a chunk per OUTERMOST boundary construct; constructs nested
  *     inside a boundary are swallowed by it (`cst-operations.ts:36-70`
  *     `insideBoundary` — a method inside a class is part of the class
  *     chunk, never its own);
  *   - the chunk spans the WHOLE construct (body included), and text
  *     between boundaries is not emitted (`boundariesToChunks`,
  *     `cst-operations.ts:100-110`);
  *   - boundary types are the tree-sitter node-type names per language
  *     (`function_definition`, `method_declaration`, `struct_item`, …)
  *     so downstream filters written against the reference match;
  *   - names come from the declaration identifier, mirroring the
  *     node-name extractor (`language-node-types.ts:154-227`): nodes
  *     whose grammar has no `name` field (imports, type/var blocks,
  *     impl blocks) stay unnamed, exactly as the extractor returns
  *     `undefined` for them;
  *   - Python decorators attach to their definition
  *     (`decorated_definition` modifier inclusion,
  *     `language-node-types.ts:230-256`): the chunk text starts at the
  *     first decorator but type/name stay those of the `def`/`class`.
  *     Java annotations are likewise part of the declaration (they live
  *     in its `modifiers` child). Rust attributes are NOT attached —
  *     `attribute_item` is a sibling node in the grammar.
  *
  * Block extents: Python blocks end where indentation returns to the
  * opening level (the grammar's own block rule); brace languages
  * balance `{}`/`()`/`[]` with line comments and string/char literals
  * skipped. On sources too mangled to scan, [[ChunkDispatch]] falls
  * back to the regex chunker — the reference's own any-failure fallback
  * (`cst-operations.ts:148-190`).
  */
object CstChunker {

  /** Languages with a ported boundary inventory — the reference's full
    * 14-language table (`language-node-types.ts:6-126`). */
  val supported: Set[String] = Set(
    "python", "go", "rust", "java",
    "javascript", "typescript", "tsx", "ruby",
    "c", "cpp", "html", "css", "bash", "vue")

  private case class Cst(
      tpe: String, name: Option[String], start: Int, end: Int)

  /** CST-mode chunking: one piece per outermost boundary (no size
    * splitting — the reference ignores size options in CST mode,
    * `cst-operations.ts:134-146`). A configured real-parser binding
    * ([[CstParserBinding]]) takes precedence; any failure or
    * abstention falls back to the scanner. */
  def chunk(text: String, language: String): Seq[ChunkPiece] =
    chunkVia(CstParserBinding.active, text, language)

  private[chunk] def chunkVia(binding: Option[CstParserBinding],
      text: String, language: String): Seq[ChunkPiece] =
    binding
      .flatMap { b =>
        try b.parse(text, language)
        catch {
          // LinkageError is the binding's canonical failure (its
          // native tree-sitter lib absent at call time) and is NOT
          // NonFatal — catch it explicitly: the scanner is always a
          // valid engine, so abstain rather than kill the executor
          case _: LinkageError => None
          case scala.util.control.NonFatal(_) => None
        }
      }
      .getOrElse(scannerChunk(text, language))

  /** The scanner path — the engine's own boundary inventory port. */
  private[chunk] def scannerChunk(
      text: String, language: String): Seq[ChunkPiece] = {
    val bs = language match {
      case "python" => pythonBoundaries(text)
      case "go"     => braceBoundaries(text, GoRules)
      case "rust"   => braceBoundaries(text, RustRules)
      case "java"   => braceBoundaries(text, JavaRules)
      case "javascript"        => braceBoundaries(text, JsRules)
      case "typescript" | "tsx" => braceBoundaries(text, TsRules)
      case "ruby"   => rubyBoundaries(text)
      case "c"      => cBoundaries(text, CRules)
      case "cpp"    => cBoundaries(text, CppRules)
      case "html"   => markupBoundaries(text, vueMode = false)
      case "vue"    => markupBoundaries(text, vueMode = true)
      case "css"    => cssBoundaries(text)
      case "bash"   => bashBoundaries(text)
      case other =>
        throw new IllegalArgumentException(s"no CST rules for $other")
    }
    bs.zipWithIndex.map { case (b, i) =>
      val (sl, el) = Chunker.lineNumbers(text, b.start, b.end)
      ChunkPiece(text.substring(b.start, b.end), i, b.start, b.end,
        Some(Boundary(b.tpe, name = b.name,
          startLine = Some(sl), endLine = Some(el))))
    }
  }

  // ---------------------------------------------------------------- lines

  /** (content, startOffset) per line; offsets index the original text. */
  private def splitLines(text: String): Array[(String, Int)] = {
    val out = ArrayBuffer.empty[(String, Int)]
    var off = 0
    for (l <- text.split("\n", -1)) { out += ((l, off)); off += l.length + 1 }
    out.toArray
  }

  private def indentOf(line: String): Int = {
    var i = 0
    while (i < line.length && (line(i) == ' ' || line(i) == '\t')) i += 1
    i
  }

  private def lineEnd(lines: Array[(String, Int)], i: Int): Int =
    lines(i)._2 + lines(i)._1.length

  /** Net bracket balance of a line with strings, chars and line
    * comments stripped (naive but deterministic — the fallback path
    * covers sources this mis-scans). */
  private def netBalance(line: String, commentStart: String): Int = {
    var bal = 0
    var i = 0
    var quote: Char = 0
    while (i < line.length) {
      val c = line(i)
      if (quote != 0) {
        if (c == '\\') i += 1
        else if (c == quote) quote = 0
      } else if (c == '"' || c == '\'' || c == '`') quote = c
      else if (commentStart.nonEmpty && line.startsWith(commentStart, i)) {
        i = line.length
      } else c match {
        case '(' | '[' | '{' => bal += 1
        case ')' | ']' | '}' => bal -= 1
        case _ =>
      }
      i += 1
    }
    bal
  }

  /** Last line of a construct starting at `i`: extends while the
    * cumulative bracket balance stays positive. */
  private def balancedEnd(
      lines: Array[(String, Int)], i: Int, commentStart: String): Int = {
    var bal = netBalance(lines(i)._1, commentStart)
    var j = i
    while (bal > 0 && j + 1 < lines.length) {
      j += 1
      bal += netBalance(lines(j)._1, commentStart)
    }
    j
  }

  // --------------------------------------------------------------- python

  private val PyDef = """^(?:async\s+)?def\s+([A-Za-z_]\w*).*""".r
  private val PyClass = """^class\s+([A-Za-z_]\w*).*""".r
  private val PyImport = """^import\s+\S.*""".r
  private val PyFromImport = """^from\s+\S+\s+import\b.*""".r
  private val PyAssign = """^([A-Za-z_]\w*)\s*(?::[^=]+)?=(?!=).*""".r

  /** Last line of an indentation block opened at line `i` (blank lines
    * don't close a block; the block ends before the first non-blank
    * line at or left of the opening indent). */
  private def indentBlockEnd(lines: Array[(String, Int)], i: Int): Int = {
    val open = indentOf(lines(i)._1)
    var last = i
    var j = i + 1
    var scanning = true
    while (j < lines.length && scanning) {
      val l = lines(j)._1
      if (l.trim.isEmpty) j += 1
      else if (indentOf(l) > open) { last = j; j += 1 }
      else scanning = false
    }
    last
  }

  private def pythonBoundaries(text: String): Seq[Cst] = {
    val lines = splitLines(text)
    val out = ArrayBuffer.empty[Cst]
    var i = 0
    while (i < lines.length) {
      val (line, off) = lines(i)
      val t = line.trim
      if (t.isEmpty) i += 1
      else if (t.startsWith("@")) {
        // decorated_definition: decorators belong to the def below
        var j = i + 1
        while (j < lines.length &&
          (lines(j)._1.trim.startsWith("@") || lines(j)._1.trim.isEmpty)) j += 1
        val decl = if (j < lines.length) lines(j)._1.trim else ""
        (decl match {
          case PyDef(n)   => Some(("function_definition", n))
          case PyClass(n) => Some(("class_definition", n))
          case _          => None
        }) match {
          case Some((tpe, n)) =>
            val end = indentBlockEnd(lines, j)
            out += Cst(tpe, Some(n), off, lineEnd(lines, end))
            i = end + 1
          case None => i += 1 // stray decorator: not a definition
        }
      } else {
        val matched: Option[(Cst, Boolean)] = t match {
          case PyDef(n) =>
            Some((Cst("function_definition", Some(n), off, 0), true))
          case PyClass(n) =>
            Some((Cst("class_definition", Some(n), off, 0), true))
          case PyFromImport() =>
            Some((Cst("import_from_statement", None, off, 0), false))
          case PyImport() =>
            Some((Cst("import_statement", None, off, 0), false))
          case PyAssign(n) =>
            Some((Cst("assignment", Some(n), off, 0), false))
          case _ => None
        }
        matched match {
          case Some((b, isBlock)) =>
            val end =
              if (isBlock) indentBlockEnd(lines, i)
              else balancedEnd(lines, i, "#") // paren-continued import/assign
            out += b.copy(end = lineEnd(lines, end))
            i = end + 1
          case None => i += 1
        }
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------- brace languages

  /** One recognizer: declaration-line regex → (node type, has name). */
  private case class Rule(re: scala.util.matching.Regex,
      tpe: String, named: Boolean)

  /** Language = its recognizer list (first match wins — order encodes
    * e.g. Go method-before-function) + preceding-annotation attachment
    * (Java `modifiers` include annotations; Rust `attribute_item` is a
    * sibling, so Rust must NOT attach). */
  private case class BraceRules(rules: Seq[Rule], commentStart: String,
      attachAnnotations: Boolean)

  /** Go inventory (`language-node-types.ts:51-62`): functions, methods,
    * type/import/var/const declarations. `short_var_declaration` only
    * occurs inside functions, so like the reference it is always
    * swallowed by its enclosing boundary. */
  private val GoRules = BraceRules(Seq(
    Rule("""^func\s+\([^)]*\)\s+([A-Za-z_]\w*)\s*\(.*""".r,
      "method_declaration", named = true),
    Rule("""^func\s+([A-Za-z_]\w*)\s*\(.*""".r,
      "function_declaration", named = true),
    // no `name` field on the declaration node itself (it lives on the
    // inner *_spec), so these stay unnamed like the reference extractor
    Rule("""^type\b.*""".r, "type_declaration", named = false),
    Rule("""^import\b.*""".r, "import_declaration", named = false),
    Rule("""^var\b.*""".r, "var_declaration", named = false),
    Rule("""^const\b.*""".r, "const_declaration", named = false)),
    commentStart = "//", attachAnnotations = false)

  private val RustVis = """(?:pub(?:\s*\([^)]*\))?\s+)?"""

  /** Rust inventory (`language-node-types.ts:63-70`): fn, struct, impl,
    * trait, use, let. `pub` visibility rides the declaration line (the
    * grammar keeps `visibility_modifier` inside the item node). */
  private val RustRules = BraceRules(Seq(
    Rule((s"^$RustVis(?:async\\s+)?(?:unsafe\\s+)?" +
      "(?:extern\\s+\"[^\"]*\"\\s+)?fn\\s+([A-Za-z_]\\w*).*").r,
      "function_item", named = true),
    Rule(s"^${RustVis}struct\\s+([A-Za-z_]\\w*).*".r,
      "struct_item", named = true),
    Rule("""^(?:unsafe\s+)?impl\b.*""".r, "impl_item", named = false),
    Rule(s"^$RustVis(?:unsafe\\s+)?trait\\s+([A-Za-z_]\\w*).*".r,
      "trait_item", named = true),
    Rule(s"^${RustVis}use\\s.*".r, "use_declaration", named = false),
    Rule("""^let\s.*""".r, "let_declaration", named = false)),
    commentStart = "//", attachAnnotations = false)

  private val JavaMods =
    """(?:(?:public|private|protected|abstract|final|static|strictfp|sealed|non-sealed)\s+)*"""

  /** Java inventory (`language-node-types.ts:71-77`): classes,
    * interfaces, imports. `method_declaration` and
    * `local_variable_declaration` are boundary types too, but valid
    * Java only places them inside a class/interface body, so — exactly
    * like the reference's suppression test — they are always part of
    * the enclosing class chunk. */
  private val JavaRules = BraceRules(Seq(
    Rule(s"^${JavaMods}class\\s+([A-Za-z_$$][\\w$$]*).*".r,
      "class_declaration", named = true),
    Rule(s"^${JavaMods}interface\\s+([A-Za-z_$$][\\w$$]*).*".r,
      "interface_declaration", named = true),
    Rule("""^import\s.*""".r, "import_declaration", named = false)),
    commentStart = "//", attachAnnotations = true)

  /** JS/TS `export` prefix — the reference's modifier-node inclusion
    * (`export_statement` wraps the declaration; chunk text includes it,
    * the TYPE stays the inner declaration's —
    * `language-node-types.ts:230-239`, `cst-operations.ts:38-54`).
    * Line-based scanning keeps the prefix in the chunk for free. */
  private val JsExport = """(?:export\s+(?:default\s+)?)?"""

  /** JavaScript inventory (`language-node-types.ts:7-17`): functions,
    * classes, imports, variable declarations. A `const f = () => {}`
    * arrow is OUTERMOST a `lexical_declaration` (the arrow node nests
    * inside), and the name extractor finds no direct identifier child
    * on the declaration node, so these stay unnamed — reference
    * extractor semantics (`language-node-types.ts:154-161, 246-250`). */
  private val JsRulesBase = Seq(
    Rule((s"^$JsExport(?:async\\s+)?function\\*?\\s+([A-Za-z_$$][\\w$$]*).*").r,
      "function_declaration", named = true),
    Rule(s"^${JsExport}class\\s+([A-Za-z_$$][\\w$$]*).*".r,
      "class_declaration", named = true),
    Rule("""^import\s.*""".r, "import_statement", named = false),
    Rule(s"^$JsExport(?:const|let)\\s.*".r,
      "lexical_declaration", named = false),
    Rule(s"^${JsExport}var\\s.*".r, "variable_declaration", named = false))

  private val JsRules =
    BraceRules(JsRulesBase, commentStart = "//", attachAnnotations = false)

  /** TypeScript/TSX add interfaces and type aliases
    * (`language-node-types.ts:18-44`). */
  private val TsRules = BraceRules(
    Seq(
      Rule(s"^${JsExport}interface\\s+([A-Za-z_$$][\\w$$]*).*".r,
        "interface_declaration", named = true),
      Rule(s"^${JsExport}type\\s+([A-Za-z_$$][\\w$$]*)\\b[^=]*=.*".r,
        "type_alias_declaration", named = true)) ++ JsRulesBase,
    commentStart = "//", attachAnnotations = false)

  private def braceBoundaries(text: String, lang: BraceRules): Seq[Cst] = {
    val lines = splitLines(text)
    val out = ArrayBuffer.empty[Cst]
    var pendingAnnotation = -1 // first line of a contiguous @… run
    var i = 0
    while (i < lines.length) {
      val (line, off) = lines(i)
      val t = line.trim
      if (t.isEmpty) { i += 1 }
      else if (lang.attachAnnotations && t.startsWith("@")) {
        if (pendingAnnotation < 0) pendingAnnotation = i
        i += 1
      } else {
        lang.rules.iterator.flatMap { r =>
          t match {
            case r.re(groups @ _*) =>
              Some(Cst(r.tpe,
                if (r.named) groups.headOption else None, off, 0))
            case _ => None
          }
        }.nextOption() match {
          case Some(b) =>
            val start =
              if (pendingAnnotation >= 0) lines(pendingAnnotation)._2 else off
            val end = balancedEnd(lines, i, lang.commentStart)
            out += b.copy(start = start, end = lineEnd(lines, end))
            i = end + 1
          case None => i += 1
        }
        pendingAnnotation = -1
      }
    }
    out.toSeq
  }

  // ----------------------------------------------------------------- ruby

  private val RbDef = """^def\s+(?:self\.)?([A-Za-z_]\w*[?!=]?).*""".r
  private val RbClass = """^class\s+([A-Z]\w*).*""".r
  private val RbModule = """^module\s+([A-Z]\w*).*""".r
  private val RbRequire = """^(require|load)\b.*""".r
  private val RbAssign = """^([A-Za-z_]\w*)\s*=(?!=).*""".r
  private val RbOpener =
    """^(?:def|class|module|if|unless|while|until|case|begin|for)\b.*""".r
  private val RbDo = """.*\bdo\s*(?:\|[^|]*\|)?\s*$""".r
  // statement-position `end` only: line start or right after `;`.
  // A bare \bend\b would also count method calls (`arr.end`) and
  // range accessors (`(1..x).end`), silently truncating the block.
  private val RbEnd = """(?:^|;)\s*end\b""".r

  /** `end`-matched block extent: statement-START block keywords and
    * trailing `do` open, `end` closes. Modifier-position conditionals
    * (`x if y`) never sit at line start, so they do not open — the
    * naive-scan caveat, covered by the dispatch fallback. `end` counts
    * only in statement position (line start / after `;`), so `arr.end`
    * or `(1..x).end` inside a block cannot truncate it. */
  private def rubyBlockEnd(lines: Array[(String, Int)], i: Int): Int = {
    var depth = 0
    var j = i
    while (j < lines.length) {
      val t0 = lines(j)._1.trim
      // strip string contents AND the line comment — a literal like
      // "the end" must not close a block
      val t = {
        val sb = new StringBuilder
        var q: Char = 0; var k = 0; var done = false
        while (k < t0.length && !done) {
          val c = t0(k)
          if (q != 0) { if (c == q) q = 0 }
          else if (c == '"' || c == '\'') q = c
          else if (c == '#') done = true
          else sb.append(c)
          k += 1
        }
        sb.toString
      }
      val opens = (if (RbOpener.matches(t)) 1 else 0) +
        (if (!RbOpener.matches(t) && RbDo.matches(t)) 1 else 0)
      val ends = RbEnd.findAllIn(t).length
      depth += opens - ends
      if (depth <= 0) return j // incl. one-liner `def x; y; end`
      j += 1
    }
    lines.length - 1
  }

  /** Ruby inventory (`language-node-types.ts:78-84`): methods, classes,
    * modules, require/load, assignments. Assignment names come from the
    * extractor's direct-identifier-child fallback (the left side). */
  private def rubyBoundaries(text: String): Seq[Cst] = {
    val lines = splitLines(text)
    val out = ArrayBuffer.empty[Cst]
    var i = 0
    while (i < lines.length) {
      val (line, off) = lines(i)
      val t = line.trim
      val matched: Option[(String, Option[String], Boolean)] = t match {
        case RbDef(n)     => Some(("method", Some(n), true))
        case RbClass(n)   => Some(("class", Some(n), true))
        case RbModule(n)  => Some(("module", Some(n), true))
        case RbRequire(k) => Some((k, None, false))
        case RbAssign(n)  => Some(("assignment", Some(n), false))
        case _            => None
      }
      matched match {
        case Some((tpe, name, block)) =>
          val end = if (block) rubyBlockEnd(lines, i) else i
          out += Cst(tpe, name, off, lineEnd(lines, end))
          i = end + 1
        case None => i += 1
      }
    }
    out.toSeq
  }

  // ----------------------------------------------------------------- c/c++

  /** Generalized construct end for C-family layout: runs to the close
    * of the first brace group (which may OPEN on a later line — K&R /
    * Allman styles), or to the first `;`-terminated line if no brace
    * group starts before it. */
  private def cConstructEnd(
      lines: Array[(String, Int)], i: Int): Int = {
    var cum = 0
    var sawOpen = false
    var j = i
    while (j < lines.length) {
      cum += netBalance(lines(j)._1, "//")
      if (cum > 0) sawOpen = true
      if (sawOpen && cum <= 0) return j
      if (!sawOpen && lines(j)._1.trim.endsWith(";")) return j
      j += 1
    }
    lines.length - 1
  }

  private case class CRule(re: scala.util.matching.Regex,
      tpe: String, named: Boolean)

  /** C inventory (`language-node-types.ts:85-92`). `function_definition`
    * carries its name in a `declarator` (not a `name` field), so — per
    * the reference extractor — C functions stay UNNAMED; structs/enums
    * have real name fields. */
  private val CRules = Seq(
    CRule("""^#\s*include\b.*""".r, "preproc_include", named = false),
    CRule("""^typedef\b.*""".r, "type_definition", named = false),
    CRule("""^(?:static\s+|const\s+)*struct\s+([A-Za-z_]\w*).*""".r,
      "struct_specifier", named = true),
    CRule("""^(?:static\s+|const\s+)*enum\s+([A-Za-z_]\w*).*""".r,
      "enum_specifier", named = true),
    // call-less top level: an identifier line with '(' and no ';' end
    CRule("""^[A-Za-z_][\w\s\*]*\([^;]*$""".r,
      "function_definition", named = false),
    CRule("""^[A-Za-z_].*;\s*$""".r, "declaration", named = false))

  /** C++ adds classes, namespaces, templates
    * (`language-node-types.ts:93-101`). */
  private val CppRules = Seq(
    CRule("""^#\s*include\b.*""".r, "preproc_include", named = false),
    CRule("""^typedef\b.*""".r, "type_definition", named = false),
    CRule("""^template\s*<.*""".r, "template_declaration", named = false),
    CRule("""^namespace\s+([A-Za-z_][\w:]*).*""".r,
      "namespace_definition", named = true),
    CRule("""^class\s+([A-Za-z_]\w*).*""".r, "class_specifier", named = true),
    CRule("""^(?:static\s+|const\s+)*struct\s+([A-Za-z_]\w*).*""".r,
      "struct_specifier", named = true),
    CRule("""^[A-Za-z_][\w\s\*:<>~]*\([^;]*$""".r,
      "function_definition", named = false),
    CRule("""^[A-Za-z_].*;\s*$""".r, "declaration", named = false))

  private def cBoundaries(text: String, rules: Seq[CRule]): Seq[Cst] = {
    val lines = splitLines(text)
    val out = ArrayBuffer.empty[Cst]
    var i = 0
    while (i < lines.length) {
      val (line, off) = lines(i)
      val t = line.trim
      if (t.isEmpty || t.startsWith("//")) i += 1
      else rules.iterator.flatMap { r =>
        t match {
          case r.re(groups @ _*) =>
            Some(Cst(r.tpe, if (r.named) groups.headOption else None, off, 0))
          case _ => None
        }
      }.nextOption() match {
        case Some(b) =>
          val end =
            if (b.tpe == "preproc_include") i else cConstructEnd(lines, i)
          out += b.copy(end = lineEnd(lines, end))
          i = end + 1
        case None => i += 1
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------- html/vue

  private val TagOpen = """^<([a-zA-Z][\w-]*)([^>]*)>?.*""".r
  private val VoidTags = Set("br", "hr", "img", "input", "link", "meta",
    "area", "base", "col", "embed", "source", "track", "wbr")

  /** Top-level markup elements. HTML: every outermost element is a
    * boundary (script/style get their dedicated types). Vue: only the
    * SFC blocks template/script/style are top-level boundaries
    * (`language-node-types.ts:102-106, 118-125`); components,
    * directives and interpolations nest inside the template and are
    * swallowed, per the outermost-boundary rule. */
  private def markupBoundaries(text: String, vueMode: Boolean): Seq[Cst] = {
    val lines = splitLines(text)
    val out = ArrayBuffer.empty[Cst]
    var i = 0
    while (i < lines.length) {
      val (line, off) = lines(i)
      line.trim match {
        case TagOpen(tag, attrs) if indentOf(line) == 0 =>
          val lt = tag.toLowerCase
          val keep = !vueMode || Set("template", "script", "style")(lt)
          val selfClosed = attrs.endsWith("/") || VoidTags(lt)
          val end =
            if (selfClosed) i
            else {
              // word-boundary-safe tag occurrence counts (`<div` must
              // not count `<divider`)
              val openRe = s"(?i)<$lt(?![\\w-])".r
              val closeRe = s"(?i)</$lt(?![\\w-])".r
              var depth = 0
              var j = i
              var found = -1
              while (j < lines.length && found < 0) {
                val l = lines(j)._1
                val nc = closeRe.findAllIn(l).length
                depth += openRe.findAllIn(l).length - nc
                if (depth <= 0 && nc > 0) found = j
                j += 1
              }
              if (found < 0) lines.length - 1 else found
            }
          if (keep) {
            val tpe = lt match {
              case "script"   => "script_element"
              case "style"    => "style_element"
              case "template" if vueMode => "template_element"
              case _          => "element"
            }
            out += Cst(tpe, None, off, lineEnd(lines, end))
          }
          i = end + 1
        case _ => i += 1
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------------ css

  /** CSS inventory (`language-node-types.ts:107-112`): rule sets,
    * @media, @keyframes, @import. Selector lines open a brace-balanced
    * rule_set; none of these node types carries a name field. */
  private def cssBoundaries(text: String): Seq[Cst] = {
    val lines = splitLines(text)
    val out = ArrayBuffer.empty[Cst]
    var i = 0
    while (i < lines.length) {
      val (line, off) = lines(i)
      val t = line.trim
      if (t.isEmpty || t.startsWith("/*")) i += 1
      else {
        val tpe =
          if (t.startsWith("@import")) "import_statement"
          else if (t.startsWith("@media")) "media_statement"
          else if (t.startsWith("@keyframes")) "keyframes_statement"
          else "rule_set"
        val end =
          if (tpe == "import_statement") i else cConstructEnd(lines, i)
        out += Cst(tpe, None, off, lineEnd(lines, end))
        i = end + 1
      }
    }
    out.toSeq
  }

  // ----------------------------------------------------------------- bash

  private val ShFun1 = """^(?:function\s+)?([A-Za-z_]\w*)\s*\(\)\s*\{?.*""".r
  private val ShFun2 = """^function\s+([A-Za-z_]\w*)\s*\{?.*""".r
  private val ShAssign = """^([A-Za-z_]\w*)=.*""".r

  /** Bash inventory (`language-node-types.ts:113-117`): function
    * definitions (named — the grammar has a name field), variable
    * assignments, and plain commands (each top-level command IS a
    * boundary node in the grammar, so each becomes a chunk). */
  private def bashBoundaries(text: String): Seq[Cst] = {
    val lines = splitLines(text)
    val out = ArrayBuffer.empty[Cst]
    var i = 0
    while (i < lines.length) {
      val (line, off) = lines(i)
      val t = line.trim
      if (t.isEmpty || t.startsWith("#")) i += 1
      else {
        val (tpe, name) = t match {
          case ShFun1(n)  => ("function_definition", Some(n))
          case ShFun2(n)  => ("function_definition", Some(n))
          case ShAssign(n) => ("variable_assignment", Some(n))
          case _          => ("command", None)
        }
        val end =
          if (tpe == "function_definition") balancedEnd(lines, i, "#")
          else i
        out += Cst(tpe, name, off, lineEnd(lines, end))
        i = end + 1
      }
    }
    out.toSeq
  }
}

package graft.chunk

import org.scalatest.funsuite.AnyFunSuite

/** C4 boundary semantics, mirroring the reference's CST fixtures
  * (`src/core/chunk/cst-operations-python.test.ts`,
  * `cst-operations-go.test.ts`, `cst-operations-additional.test.ts`):
  * same code snippets, same expected node types / names / suppression
  * behavior. */
class CstChunkerSpec extends AnyFunSuite {

  private def boundaries(code: String, lang: String) =
    CstChunker.chunk(code, lang).map(p =>
      (p.boundary.get.boundaryType, p.boundary.get.name, p.content))

  // ---- Python (cst-operations-python.test.ts) ----

  test("python: detects function definitions with name") {
    val bs = boundaries("def add(a, b):\n    return a + b", "python")
    val f = bs.find(_._1 == "function_definition")
    assert(f.isDefined && f.get._2 === Some("add"))
    assert(f.get._3.contains("return a + b")) // whole body in the chunk
  }

  test("python: class swallows its methods (insideBoundary suppression)") {
    val code = """class Calculator:
                 |    def __init__(self):
                 |        self.value = 0
                 |
                 |    def add(self, x):
                 |        self.value += x""".stripMargin
    val bs = boundaries(code, "python")
    val c = bs.find(_._1 == "class_definition")
    assert(c.isDefined && c.get._2 === Some("Calculator"))
    assert(c.get._3.contains("def add")) // methods inside the class chunk
    assert(!bs.exists(_._1 == "function_definition"))
  }

  test("python: detects async functions") {
    val code = "async def fetch_data():\n    await asyncio.sleep(1)\n    return \"data\""
    val f = boundaries(code, "python").find(_._1 == "function_definition")
    assert(f.isDefined && f.get._2 === Some("fetch_data"))
  }

  test("python: detects import statements (both forms)") {
    val code = "import os\nfrom typing import List\nimport asyncio as aio"
    val bs = boundaries(code, "python")
    assert(bs.count(_._1 == "import_statement") === 2)
    assert(bs.count(_._1 == "import_from_statement") === 1)
  }

  test("python: decorated_definition attaches decorators to the def") {
    val code = """@cache
                 |@retry(times=3)
                 |def fetch(url):
                 |    return get(url)
                 |
                 |x = 1""".stripMargin
    val bs = boundaries(code, "python")
    val f = bs.find(_._1 == "function_definition").get
    assert(f._2 === Some("fetch"))
    assert(f._3.startsWith("@cache")) // chunk text includes decorators
    assert(bs.exists(b => b._1 == "assignment" && b._2 == Some("x")))
  }

  test("python: module-level assignment is a boundary; one inside a def is not") {
    val code = """CONFIG = {
                 |    "a": 1,
                 |}
                 |
                 |def f():
                 |    local = 2""".stripMargin
    val bs = boundaries(code, "python")
    val a = bs.filter(_._1 == "assignment")
    assert(a.map(_._2) === Seq(Some("CONFIG")))
    assert(a.head._3.contains("\"a\": 1")) // paren-continued extent
  }

  // ---- Go (cst-operations-go.test.ts) ----

  test("go: detects function declarations with name") {
    val code = "func add(a, b int) int {\n    return a + b\n}"
    val f = boundaries(code, "go").find(_._1 == "function_declaration")
    assert(f.isDefined && f.get._2 === Some("add"))
  }

  test("go: detects method declarations with name") {
    val code = "func (c *Calculator) Add(a, b int) int {\n    return a + b\n}"
    val m = boundaries(code, "go").find(_._1 == "method_declaration")
    assert(m.isDefined && m.get._2 === Some("Add"))
  }

  test("go: detects type declarations (unnamed, like the node extractor)") {
    val code = "type Calculator struct {\n    value int\n}"
    val t = boundaries(code, "go").find(_._1 == "type_declaration")
    assert(t.isDefined && t.get._2 === None)
    assert(t.get._3.contains("value int"))
  }

  test("go: detects grouped import declarations") {
    val code = "import (\n    \"fmt\"\n    \"net/http\"\n)"
    val is = boundaries(code, "go").filter(_._1 == "import_declaration")
    assert(is.nonEmpty && is.head._3.contains("net/http"))
  }

  test("go: detects var and const declarations") {
    val code = "var x int = 10\nconst PI = 3.14"
    val bs = boundaries(code, "go")
    assert(bs.exists(_._1 == "var_declaration"))
    assert(bs.exists(_._1 == "const_declaration"))
  }

  // ---- Rust (cst-operations-additional.test.ts) ----

  test("rust: detects function items with name") {
    val code = "fn add(a: i32, b: i32) -> i32 {\n    a + b\n}"
    val f = boundaries(code, "rust").find(_._1 == "function_item")
    assert(f.isDefined && f.get._2 === Some("add"))
  }

  test("rust: detects struct items") {
    val code = "struct Point {\n    x: f64,\n    y: f64,\n}"
    val s = boundaries(code, "rust").find(_._1 == "struct_item")
    assert(s.isDefined && s.get._2 === Some("Point"))
  }

  test("rust: pub fn, impl blocks, use and unit structs") {
    val code = """use std::fmt;
                 |
                 |pub struct Id;
                 |
                 |impl fmt::Display for Id {
                 |    fn fmt(&self, f: &mut fmt::Formatter) -> fmt::Result {
                 |        write!(f, "id")
                 |    }
                 |}
                 |
                 |pub fn run() {}""".stripMargin
    val bs = boundaries(code, "rust")
    assert(bs.exists(_._1 == "use_declaration"))
    assert(bs.exists(b => b._1 == "struct_item" && b._2 == Some("Id")))
    val impl = bs.find(_._1 == "impl_item").get
    assert(impl._3.contains("fn fmt")) // fn inside impl is swallowed
    assert(bs.filter(_._1 == "function_item").map(_._2) === Seq(Some("run")))
  }

  // ---- Java (cst-operations-additional.test.ts) ----

  test("java: class boundary swallows its methods") {
    val code = """public class Calculator {
                 |    public int add(int a, int b) {
                 |        return a + b;
                 |    }
                 |}""".stripMargin
    val bs = boundaries(code, "java")
    val c = bs.find(_._1 == "class_declaration")
    assert(c.isDefined && c.get._2 === Some("Calculator"))
    assert(!bs.exists(_._1 == "method_declaration"))
  }

  test("java: imports, interfaces, and annotation attachment") {
    val code = """import java.util.List;
                 |
                 |@FunctionalInterface
                 |public interface Adder {
                 |    int add(int a, int b);
                 |}""".stripMargin
    val bs = boundaries(code, "java")
    assert(bs.exists(_._1 == "import_declaration"))
    val i = bs.find(_._1 == "interface_declaration").get
    assert(i._2 === Some("Adder"))
    assert(i._3.startsWith("@FunctionalInterface"))
  }

  // ---- dispatch integration ----

  test("dispatch routes supported languages through the CST chunker " +
      "and keeps line numbers") {
    val code = "import os\n\ndef f():\n    return 1"
    val ps = ChunkDispatch.chunk(code, Some("/src/m.py"),
      preserveBoundaries = true)
    assert(ps.map(_.boundary.get.boundaryType) ===
      Seq("import_statement", "function_definition"))
    assert(ps(1).boundary.get.startLine === Some(3))
    assert(ps(1).boundary.get.endLine === Some(4))
    // offsets index the original text exactly
    ps.foreach(p => assert(code.substring(p.start, p.end) === p.content))
  }

  // ---- JavaScript / TypeScript (cst-operations.test.ts:16-130) ----

  test("javascript: function declaration with name, whole text") {
    val code = "function add(a, b) { return a + b; }"
    val bs = boundaries(code, "javascript")
    assert(bs === Seq(("function_declaration", Some("add"), code)))
  }

  test("javascript: arrow inside lexical_declaration, unnamed, whole line") {
    val code = "const add = (a, b) => a + b;"
    val b = boundaries(code, "javascript").find(_._1 == "lexical_declaration")
    assert(b.isDefined && b.get._2 === None && b.get._3 === code)
  }

  test("javascript: class swallows methods; name extracted") {
    val code =
      "class Calculator { constructor() {} add(a, b) { return a + b; } }"
    val bs = boundaries(code, "javascript")
    val c = bs.find(_._1 == "class_declaration")
    assert(c.isDefined && c.get._2 === Some("Calculator") && c.get._3 === code)
    assert(!bs.exists(_._1 == "method_definition"))
  }

  test("javascript: imports and var kinds") {
    val code = "import { x } from \"m\";\nimport React from \"react\";\n" +
      "const a = 10;\nlet b = 20;\nvar c = 30;"
    val bs = boundaries(code, "javascript")
    assert(bs.count(_._1 == "import_statement") === 2)
    assert(bs.count(_._1 == "lexical_declaration") === 2)
    assert(bs.count(_._1 == "variable_declaration") === 1)
  }

  test("javascript: export prefix rides the chunk, type stays inner") {
    val code = "export default function main() {\n  return 1;\n}"
    val bs = boundaries(code, "javascript")
    assert(bs.head._1 === "function_declaration")
    assert(bs.head._2 === Some("main"))
    assert(bs.head._3.startsWith("export default function"))
  }

  test("typescript: interface and type alias named") {
    val code = "export interface User {\n  id: number;\n}\n" +
      "type Id = string | number;"
    val bs = boundaries(code, "typescript")
    assert(bs.exists(b => b._1 == "interface_declaration" &&
      b._2 == Some("User") && b._3.contains("id: number")))
    assert(bs.exists(b => b._1 == "type_alias_declaration" &&
      b._2 == Some("Id")))
  }

  // ---- Ruby ----

  test("ruby: class swallows methods, end-matched extent") {
    val code = """class Greeter
                 |  def initialize(name)
                 |    @name = name
                 |  end
                 |
                 |  def greet
                 |    puts "hi #{@name}"
                 |  end
                 |end
                 |
                 |def standalone
                 |  42
                 |end""".stripMargin
    val bs = boundaries(code, "ruby")
    val c = bs.find(_._1 == "class")
    assert(c.isDefined && c.get._2 === Some("Greeter"))
    assert(c.get._3.contains("def greet")) // swallowed
    val m = bs.filter(_._1 == "method")
    assert(m.map(_._2) === Seq(Some("standalone")))
  }

  test("ruby: nested blocks don't end the method early; requires detected") {
    val code = """require "json"
                 |
                 |def risky(x)
                 |  if x > 0
                 |    x
                 |  else
                 |    -x
                 |  end
                 |end""".stripMargin
    val bs = boundaries(code, "ruby")
    assert(bs.exists(_._1 == "require"))
    val m = bs.find(_._1 == "method")
    assert(m.isDefined && m.get._2 === Some("risky"))
    assert(m.get._3.trim.endsWith("end")) // outer end, not the if's
    assert(m.get._3.contains("else"))
  }

  test("ruby: 'end' inside a string literal doesn't close the block") {
    val code = """def story
                 |  puts "the end"
                 |  42
                 |end""".stripMargin
    val m = boundaries(code, "ruby").find(_._1 == "method")
    assert(m.isDefined && m.get._3.contains("42")) // body fully included
  }

  test("ruby: 'end' as a method call or range accessor doesn't close " +
      "the block") {
    val code = """def span(arr)
                 |  last = arr.end
                 |  r = (1..9).end
                 |  last + r
                 |end""".stripMargin
    val m = boundaries(code, "ruby").find(_._1 == "method")
    assert(m.isDefined && m.get._2 === Some("span"))
    assert(m.get._3.contains("last + r")) // not truncated at arr.end
    assert(m.get._3.trim.endsWith("end"))
  }

  // ---- C / C++ ----

  test("c: functions unnamed (declarator, not name field); structs named") {
    val code = """#include <stdio.h>
                 |
                 |struct Point {
                 |  int x;
                 |  int y;
                 |};
                 |
                 |int main(void)
                 |{
                 |  return 0;
                 |}""".stripMargin
    val bs = boundaries(code, "c")
    assert(bs.exists(_._1 == "preproc_include"))
    val s = bs.find(_._1 == "struct_specifier")
    assert(s.isDefined && s.get._2 === Some("Point"))
    val f = bs.find(_._1 == "function_definition")
    assert(f.isDefined && f.get._2 === None) // reference: C fns unnamed
    assert(f.get._3.contains("return 0")) // Allman brace handled
  }

  test("cpp: namespace and class named, template unnamed") {
    val code = """namespace util {
                 |  int helper() { return 1; }
                 |}
                 |
                 |template <typename T>
                 |class Box {
                 |  T value;
                 |};""".stripMargin
    val bs = boundaries(code, "cpp")
    val n = bs.find(_._1 == "namespace_definition")
    assert(n.isDefined && n.get._2 === Some("util"))
    assert(n.get._3.contains("helper")) // swallowed
    val t = bs.find(_._1 == "template_declaration")
    assert(t.isDefined && t.get._2 === None)
    assert(t.get._3.contains("T value")) // template wraps the class body
  }

  // ---- HTML / Vue ----

  test("html: top-level elements with script/style types") {
    val code = """<div class="app">
                 |  <p>inner</p>
                 |</div>
                 |<script>
                 |var x = 1;
                 |</script>
                 |<style>
                 |.a { color: red; }
                 |</style>""".stripMargin
    val bs = boundaries(code, "html")
    assert(bs.map(_._1) === Seq("element", "script_element", "style_element"))
    assert(bs.head._3.contains("<p>inner</p>")) // nested swallowed
  }

  test("vue: only SFC blocks are boundaries (cst-operations-vue.test.ts)") {
    val code = """<template>
                 |  <div class="app">
                 |    <h1>{{ title }}</h1>
                 |  </div>
                 |</template>
                 |
                 |<script setup lang="ts">
                 |const title = 'Hello Vue'
                 |</script>
                 |
                 |<style scoped>
                 |.app { text-align: center; }
                 |</style>""".stripMargin
    val bs = boundaries(code, "vue")
    assert(bs.map(_._1) ===
      Seq("template_element", "script_element", "style_element"))
    assert(bs.head._3.contains("{{ title }}"))
  }

  // ---- CSS / Bash ----

  test("css: rule sets, media and keyframes blocks, import") {
    val code = """@import url("base.css");
                 |.app {
                 |  color: red;
                 |}
                 |@media (max-width: 600px) {
                 |  .app { color: blue; }
                 |}
                 |@keyframes spin {
                 |  from { transform: rotate(0); }
                 |}""".stripMargin
    val bs = boundaries(code, "css")
    assert(bs.map(_._1) === Seq("import_statement", "rule_set",
      "media_statement", "keyframes_statement"))
    assert(bs(2)._3.contains("color: blue")) // nested rule swallowed
  }

  test("bash: functions named, assignments named, commands chunked") {
    val code = """NAME=world
                 |greet() {
                 |  echo "hi $NAME"
                 |}
                 |greet""".stripMargin
    val bs = boundaries(code, "bash")
    assert(bs.exists(b => b._1 == "variable_assignment" &&
      b._2 == Some("NAME")))
    val f = bs.find(_._1 == "function_definition")
    assert(f.isDefined && f.get._2 === Some("greet"))
    assert(f.get._3.contains("echo"))
    assert(bs.last._1 === "command")
  }

  // ---- malformed sources: scanner resilience + any-failure fallback
  // (reference: tree-sitter error recovery still yields what it can,
  // cst-operations.ts:148-190; anything worse routes to the regex
  // chunker via chunkWithFallback, cst-operations.test.ts:199-225) ----

  test("malformed js: unclosed brace — boundary extends to EOF, no crash") {
    val code = """function broken(x) {
                 |  if (x) {
                 |    return x
                 |""".stripMargin
    val bs = boundaries(code, "javascript")
    val f = bs.find(_._1 == "function_declaration")
    assert(f.isDefined && f.get._2 === Some("broken"))
    assert(f.get._3.contains("return x")) // extent ran to EOF
  }

  test("malformed python: truncated def header and dangling indent") {
    val code = "def orphan(\n    return 1\nclass Half:\n    def m(self"
    val bs = boundaries(code, "python")
    // error recovery: both decls still surface with their names
    assert(bs.exists(b => b._1 == "function_definition" &&
      b._2 == Some("orphan")))
    assert(bs.exists(b => b._1 == "class_definition" && b._2 == Some("Half")))
  }

  test("malformed go: truncated mid-function — no crash, func surfaces") {
    val code = "package main\n\nfunc gone() {\n  x := 1\n  if x >"
    val bs = boundaries(code, "go")
    val f = bs.find(_._1 == "function_declaration")
    assert(f.isDefined && f.get._2 === Some("gone"))
    assert(f.get._3.contains("x :="))
  }

  test("unrecognizable source under a code extension routes to the " +
      "regex fallback") {
    // prose carries no boundary the JS inventory recognizes → the
    // scanner yields zero boundaries → dispatch MUST fall back (the
    // reference's any-failure fallback), never return an empty chunk set
    val prose = "just some plain words\nwithout any code structure\nat all"
    assert(CstChunker.chunk(prose, "javascript").isEmpty)
    val viaDispatch = ChunkDispatch.chunk(prose, Some("weird.js"), 100, 20,
      preserveBoundaries = true)
    assert(viaDispatch.nonEmpty)
    assert(viaDispatch.forall(_.boundary.exists(_.boundaryType == "statement")))
    // and the fallback loses no text
    assert(viaDispatch.map(_.content).mkString("\n") === prose)
  }

  test("empty and whitespace-only sources yield zero chunks, no fallback") {
    assert(CstChunker.chunk("", "javascript").isEmpty)
    assert(ChunkDispatch.chunk("", Some("e.js"), 100, 20,
      preserveBoundaries = true).isEmpty)
    assert(ChunkDispatch.chunk("  \n\t\n", Some("e.py"), 100, 20,
      preserveBoundaries = true).isEmpty)
  }
}

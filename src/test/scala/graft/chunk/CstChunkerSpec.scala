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
}

"""Per-language extraction tests for the token-level structural parser
(codesearch/structparse.py), mirroring the reference's per-language parser
tests (colgrep/src/parser). Each fixture checks layers 1-4: definitions +
signatures + docstrings + params, call graph (calls/called_by), control
flow (complexity/loops/branches/errors), variables — and the property regex
parsing cannot have: braces inside strings/comments don't break extents."""

from nextplaid_tpu.codesearch.parser import extract_units
from nextplaid_tpu.codesearch.types import UnitType


def _by_name(units):
    return {u.name: u for u in units}


def test_go_extraction():
    src = '''package main

import (
\t"fmt"
\t"strings"
)

// Greet builds a greeting.
// It upper-cases the name.
func Greet(name string, times int) string {
\tout := ""
\tfor i := 0; i < times; i++ {
\t\tif i > 0 {
\t\t\tout += " "
\t\t}
\t\tout += fmt.Sprintf("hi {not a brace} %s", strings.ToUpper(name))
\t}
\treturn out
}

type Server struct {
\taddr string
}

func (s *Server) Handle(path string) error {
\tdefer recover()
\treturn validate(path)
}
'''
    units = _by_name(extract_units("main.go", src))
    g = units["Greet"]
    assert g.unit_type == UnitType.FUNCTION
    assert g.parameters == ["name", "times"]
    assert "Greet builds a greeting" in g.docstring
    assert "upper-cases" in g.docstring
    assert g.has_loops and g.has_branches
    assert g.complexity >= 3
    assert "Sprintf" in g.calls and "ToUpper" in g.calls
    assert "out" in g.variables  # := declaration
    assert "fmt" in g.imports and "strings" in g.imports

    s = units["Server"]
    assert s.unit_type == UnitType.CLASS

    h = units["Handle"]
    assert h.unit_type == UnitType.METHOD
    assert h.parent_class == "Server"
    assert h.has_error_handling  # defer/recover
    assert "validate" in h.calls


def test_rust_extraction():
    src = '''use std::collections::HashMap;

/// Scores a query against documents.
/// Returns the best ids.
pub fn score_all(query: &[f32], docs: &HashMap<u32, Vec<f32>>) -> Vec<u32> {
    let mut best = Vec::new();
    for (id, d) in docs.iter() {
        // brace in comment: }
        let s = dot(query, d);
        if s > 0.5 {
            best.push(*id);
        }
    }
    best
}

struct Index {
    dim: usize,
}

impl Index {
    pub fn new(dim: usize) -> Self {
        Self { dim }
    }

    fn validate(&self) -> Result<(), String> {
        if self.dim == 0 {
            return Err("empty {".to_string());
        }
        Ok(())
    }
}
'''
    units = _by_name(extract_units("lib.rs", src))
    f = units["score_all"]
    assert f.unit_type == UnitType.FUNCTION
    assert "Scores a query" in f.docstring
    assert f.parameters == ["query", "docs"]
    assert "Vec < u32 >" in (f.return_type or "") or "Vec" in (f.return_type or "")
    assert "dot" in f.calls and "push" in f.calls
    assert f.has_loops and f.has_branches
    assert "best" in f.variables and "s" in f.variables
    assert "std" in f.imports

    assert units["Index"].unit_type == UnitType.CLASS
    new = units["new"]
    assert new.unit_type == UnitType.METHOD
    assert new.parent_class == "Index"
    v = units["validate"]
    assert v.parent_class == "Index"
    assert v.has_error_handling  # Err
    # called_by: score_all calls dot (external), validate not called here.


def test_java_extraction():
    src = '''package demo;

import java.util.List;

/** A thing that processes. */
public class Processor extends Base {
    private int count = 0;

    /** Runs the batch. */
    public List<String> process(List<String> items, int limit) throws Exception {
        for (String it : items) {
            if (it.isEmpty()) {
                throw new Exception("bad {");
            }
            count = count + transform(it).length();
        }
        return items;
    }

    private String transform(String s) {
        return s.trim();
    }
}
'''
    units = _by_name(extract_units("Processor.java", src))
    c = units["Processor"]
    assert c.unit_type == UnitType.CLASS
    assert c.extends == "Base"
    assert "processes" in (c.docstring or "")

    p = units["process"]
    assert p.unit_type == UnitType.METHOD
    assert p.parent_class == "Processor"
    assert p.parameters == ["items", "limit"]
    assert "Runs the batch" in p.docstring
    assert p.has_loops and p.has_branches and p.has_error_handling
    assert "transform" in p.calls and "isEmpty" in p.calls

    t = units["transform"]
    assert "process" in t.called_by
    assert "java" in p.imports


def test_javascript_extraction():
    src = '''import { fetch } from "node-fetch";

// Loads a page and counts links.
async function countLinks(url) {
  const res = await fetch(url);
  let n = 0;
  for (const m of res.body.matchAll(/<a /g)) {
    n += 1;
  }
  return n;
}

const double = (x) => x * 2;

class Store {
  constructor(db) {
    this.db = db;
  }

  // Saves one record.
  save(record) {
    if (!record) {
      throw new Error("empty { record");
    }
    return this.db.put(`key {interp}`, record);
  }
}
'''
    units = _by_name(extract_units("store.js", src))
    f = units["countLinks"]
    assert f.unit_type == UnitType.FUNCTION
    assert f.parameters == ["url"]
    assert "counts links" in f.docstring
    assert "fetch" in f.calls
    assert f.has_loops
    assert "n" in f.variables and "res" in f.variables

    assert units["double"].unit_type == UnitType.FUNCTION
    assert units["Store"].unit_type == UnitType.CLASS
    s = units["save"]
    assert s.unit_type == UnitType.METHOD
    assert s.parent_class == "Store"
    assert "Saves one record" in s.docstring
    assert s.has_branches and s.has_error_handling
    assert "put" in s.calls


def test_typescript_extraction():
    src = '''export interface Shape {
  area(): number;
}

export class Circle implements Shape {
  constructor(private r: number) {}

  area(): number {
    return Math.PI * this.r * this.r;
  }
}

export const make = (r: number): Circle => new Circle(r);
'''
    units = _by_name(extract_units("shape.ts", src))
    assert units["Shape"].unit_type == UnitType.CLASS
    assert units["Circle"].unit_type == UnitType.CLASS
    a = units["area"]
    assert a.parent_class == "Circle"
    m = units["make"]
    assert m.unit_type == UnitType.FUNCTION
    assert m.parameters == ["r"]
    assert "Circle" in m.calls  # new Circle(


def test_c_extraction():
    src = '''#include <stdio.h>
#include "util.h"

/* Sums an array.
 * Skips negatives. */
static int sum_positive(const int *xs, int n) {
    int total = 0;
    for (int i = 0; i < n; i++) {
        if (xs[i] > 0) {
            total += xs[i];
        }
    }
    printf("done {%d}\\n", total);
    return total;
}

int main(void) {
    int data[3] = {1, -2, 3};
    return sum_positive(data, 3);
}
'''
    units = _by_name(extract_units("sum.c", src))
    f = units["sum_positive"]
    assert f.unit_type == UnitType.FUNCTION
    assert f.parameters == ["xs", "n"]
    assert "Sums an array" in f.docstring
    assert f.has_loops and f.has_branches
    assert "printf" in f.calls
    m = units["main"]
    assert "sum_positive" in m.calls
    assert "main" in f.called_by
    assert "stdio" in f.imports and "util" in f.imports


def test_cpp_extraction():
    src = '''#include <vector>

class Stack {
 public:
  void push(int v);
  bool empty() const { return data_.empty(); }

 private:
  std::vector<int> data_;
};

void Stack::push(int v) {
  data_.push_back(v);
}

int top_level(std::vector<int>& xs) {
  int best = 0;
  for (auto x : xs) {
    if (x > best) best = x;
  }
  return best;
}
'''
    units = _by_name(extract_units("stack.cpp", src))
    assert units["Stack"].unit_type == UnitType.CLASS
    p = units["push"]
    assert p.unit_type == UnitType.METHOD
    assert p.parent_class == "Stack"
    assert "push_back" in p.calls
    t = units["top_level"]
    assert t.unit_type == UnitType.FUNCTION
    assert t.has_loops and t.has_branches


def test_csharp_extraction():
    src = '''using System;

namespace Demo {
    public class Worker {
        /// <summary>Processes all items.</summary>
        public int Run(string[] items) {
            int done = 0;
            foreach (var it in items) {
                try {
                    done += Handle(it);
                } catch (Exception e) {
                    Console.WriteLine("err {0}", e);
                }
            }
            return done;
        }

        private int Handle(string s) => s.Length;
    }
}
'''
    units = _by_name(extract_units("worker.cs", src))
    w = units["Worker"]
    assert w.unit_type == UnitType.CLASS
    r = units["Run"]
    assert r.parent_class == "Worker"
    assert r.has_error_handling
    assert "Handle" in r.calls and "WriteLine" in r.calls
    assert "Processes all items" in (r.docstring or "")


def test_ruby_extraction():
    src = '''require "json"

# Tracks totals.
class Counter
  def initialize(limit)
    @limit = limit
    @n = 0
  end

  # Adds when allowed.
  # Returns the new count.
  def add!(x)
    return @n if x.nil?
    @n += 1 while x > 0 and @n < @limit
    validate
    @n
  end

  def valid?
    @n <= @limit
  end

  private

  def validate
    raise "too many {" unless valid?
  end
end

def helper(a, b)
  [a, b].each do |v|
    puts v if v
  end
end
'''
    units = _by_name(extract_units("counter.rb", src))
    c = units["Counter"]
    assert c.unit_type == UnitType.CLASS
    assert "Tracks totals" in (c.docstring or "")

    add = units["add!"]
    assert add.unit_type == UnitType.METHOD
    assert add.parent_class == "Counter"
    assert add.parameters == ["x"]
    assert "Adds when allowed" in add.docstring
    assert "validate" in add.calls

    v = units["validate"]
    assert v.parent_class == "Counter"
    assert v.has_error_handling
    assert "add!" in v.called_by

    assert units["valid?"].unit_type == UnitType.METHOD
    h = units["helper"]
    assert h.unit_type == UnitType.FUNCTION
    assert h.parameters == ["a", "b"]
    # the modifier `if v` and the `do |v|` block must not desync `end`
    # matching: helper's extent ends at the last line.
    assert h.end_line >= src.count("\n") - 1
    assert "json" in h.imports


def test_braces_in_strings_do_not_break_extents():
    src = '''function tricky() {
  const s = "}}}{{{";
  const t = `template ${"}"} more`;
  // }}} comment braces
  return s + t;
}

function after() {
  return 1;
}
'''
    units = _by_name(extract_units("tricky.js", src))
    assert "tricky" in units and "after" in units
    t = units["tricky"]
    assert t.end_line == 6
    assert units["after"].line == 8


def test_unsupported_language_falls_back_to_regex():
    src = (
        "#!/bin/sh\n"
        "do_build() {\n"
        "  make all\n"
        "}\n"
    )
    units = extract_units("build.sh", src)
    assert units  # shell -> regex/raw fallback still indexes the file


def test_go_generic_function():
    """Go 1.18 generics: func F[T any](...) must yield a structured unit."""
    src = (
        "package m\n\n"
        "func Map[T any, U any](xs []T, f func(T) U) []U {\n"
        "\tout := make([]U, 0, len(xs))\n"
        "\tfor _, x := range xs {\n"
        "\t\tout = append(out, f(x))\n"
        "\t}\n"
        "\treturn out\n"
        "}\n"
    )
    units = extract_units("m.go", src)
    names = [u.name for u in units]
    assert "Map" in names, names
    u = next(u for u in units if u.name == "Map")
    assert "xs" in (u.parameters or []) and "f" in (u.parameters or [])


def test_typescript_generic_method():
    """TS class methods with type params: m<T>(x: T) must be recognized."""
    src = (
        "class Box {\n"
        "  wrap<T extends object>(value: T): T {\n"
        "    return value;\n"
        "  }\n"
        "}\n"
    )
    units = extract_units("box.ts", src)
    m = [u for u in units if u.name == "wrap"]
    assert m, [u.name for u in units]
    assert m[0].parent_class == "Box"


def test_ruby_endless_method_does_not_desync():
    """`def foo = expr` has no `end`; later extents must stay correct."""
    src = (
        "class Calc\n"
        "  def double(x) = x * 2\n"
        "  def triple(x)\n"
        "    x * 3\n"
        "  end\n"
        "end\n"
    )
    units = extract_units("calc.rb", src)
    trip = [u for u in units if u.name == "triple"]
    assert trip, [u.name for u in units]
    # triple's body must end at ITS `end` (line 5), not swallow the class's.
    assert trip[0].end_line <= 5


def test_kotlin_structural():
    src = (
        "import kotlinx.coroutines.flow.Flow\n\n"
        "class Repo(val db: Db) {\n"
        "  /** Fetch a user. */\n"
        "  fun fetch(id: Int): User {\n"
        "    val cached = db.get(id)\n"
        "    if (cached != null) { return cached }\n"
        "    return db.load(id)\n"
        "  }\n"
        "}\n\n"
        'fun String.brace() = "{ not a brace }"\n\n'
        "fun top(n: Int): Int {\n"
        "  var total = 0\n"
        "  for (i in 0..n) { total += i }\n"
        "  return total\n"
        "}\n"
    )
    units = extract_units("repo.kt", src)
    names = {u.name: u for u in units}
    assert "Repo" in names and "fetch" in names and "top" in names
    assert names["fetch"].parent_class == "Repo"
    assert "id" in names["fetch"].parameters
    assert names["fetch"].return_type and "User" in names["fetch"].return_type
    assert "get" in names["fetch"].calls or "load" in names["fetch"].calls
    assert names["top"].complexity >= 2  # the for loop


def test_swift_structural():
    src = (
        "import Foundation\n\n"
        "struct Point { }\n\n"
        "class Shape {\n"
        "  init(name: String) {\n"
        "    self.name = name\n"
        "  }\n"
        "  func area(scale: Double) -> Double {\n"
        "    let s = \"{ not code }\"\n"
        "    if scale > 1 { return base * scale }\n"
        "    return base\n"
        "  }\n"
        "}\n"
    )
    units = extract_units("shape.swift", src)
    names = {u.name: u for u in units}
    assert "Shape" in names and "area" in names and "init" in names
    assert names["area"].parent_class == "Shape"
    assert names["init"].parent_class == "Shape"
    assert "scale" in names["area"].parameters


def test_scala_structural():
    src = (
        "import scala.collection.mutable\n\n"
        "object Calc {\n"
        "  def sum(xs: List[Int]): Int = {\n"
        "    var t = 0\n"
        "    xs.foreach { x => t += x }\n"
        "    t\n"
        "  }\n"
        "}\n\n"
        "class Engine extends Base {\n"
        "  def run(): Unit = {\n"
        "    println(\"{ }\")\n"
        "  }\n"
        "}\n"
    )
    units = extract_units("calc.scala", src)
    names = {u.name: u for u in units}
    assert "Calc" in names and "sum" in names and "Engine" in names
    assert names["sum"].parent_class == "Calc"
    assert names["Engine"].extends == "Base"
    assert "run" in names and names["run"].parent_class == "Engine"


def test_php_structural():
    src = (
        "<?php\n"
        "use App\\Models\\User;\n\n"
        "class UserRepo {\n"
        "  public function find(int $id): ?User {\n"
        "    $sql = <<<SQL\n"
        "SELECT * FROM users WHERE meta @> '{\"role\": \"admin\"}'\n"
        "SQL;\n"
        "    if ($id < 0) { return null; }\n"
        "    return $this->query($sql, $id);\n"
        "  }\n"
        "}\n\n"
        "function helper($x) {\n"
        "  # hash comment with a brace {\n"
        "  return $x * 2;\n"
        "}\n"
    )
    units = extract_units("repo.php", src)
    names = {u.name: u for u in units}
    assert "UserRepo" in names and "find" in names and "helper" in names
    assert names["find"].parent_class == "UserRepo"
    # The heredoc's brace and the # comment's brace must not corrupt extents.
    assert names["helper"].line > names["find"].end_line


# ---------------------------------------------------------------------------
# Round-3 grammars (reference types.rs:57-97): Lua, Julia, Elixir, R, Zig,
# Haskell, OCaml, SQL, CSS, QML + Vue/Svelte/HTML web formats
# ---------------------------------------------------------------------------


def test_lua_extraction():
    src = '''local M = {}

-- Compute the hypotenuse.
local function hypot(a, b)
  local s = a * a + b * b
  return math.sqrt(s)
end

function M.norm(v)
  local total = 0
  for i = 1, #v do
    total = total + v[i] * v[i]
  end
  if total == 0 then
    return 0
  end
  return math.sqrt(total)
end

function M:scale(f)
  self.factor = f
end

M.helper = function(x)
  repeat
    x = x - 1
  until x <= 0
  return x  -- "end" inside a string: end
end

return M
'''
    units = _by_name(extract_units("m.lua", src))
    h = units["hypot"]
    assert h.unit_type == UnitType.FUNCTION
    assert h.parameters == ["a", "b"]
    assert "hypotenuse" in h.docstring
    assert "sqrt" in h.calls
    norm = units["norm"]
    assert norm.unit_type == UnitType.METHOD
    assert norm.parent_class == "M" or norm.qualified_name == "M.norm"
    assert norm.has_loops and norm.has_branches
    helper = units["helper"]
    assert helper.has_loops  # repeat/until
    assert helper.line == 24 and helper.end_line == 29


def test_julia_extraction():
    src = '''module Geometry

using LinearAlgebra

abstract type Shape end

mutable struct Circle <: Shape
    radius::Float64
end

area(c::Circle) = pi * c.radius^2

function perimeter(c::Circle)
    if c.radius <= 0
        return 0.0
    end
    return 2pi * c.radius
end

function total_area(shapes)
    t = 0.0
    for s in shapes
        t += area(s)
    end
    last = shapes[end]
    return t
end

end
'''
    units = _by_name(extract_units("geo.jl", src))
    c = units["Circle"]
    assert c.unit_type == UnitType.CLASS
    assert c.extends == "Shape"
    assert units["Shape"].unit_type == UnitType.CLASS
    p = units["perimeter"]
    assert p.unit_type == UnitType.FUNCTION
    assert p.parameters == ["c"]
    assert p.has_branches
    # `shapes[end]` must not desync the end pairing
    ta = units["total_area"]
    assert ta.has_loops and "area" in ta.calls
    assert ta.end_line == 27
    assert "LinearAlgebra" in ta.imports
    assert units["area"].unit_type == UnitType.FUNCTION  # short form


def test_julia_comprehension_and_begin_index():
    """Comprehension `for`/`if` and `xs[begin]` live inside square
    brackets and are NOT block openers; pushing them desyncs end-pairing
    and silently drops the enclosing function (round-3 review)."""
    src = '''function total(xs)
    ys = [2x for x in xs]
    return sum(ys)
end

function first_elem(xs)
    return xs[begin]
end

function guarded(xs)
    zs = [x for x in xs if x > 0]
    return length(zs)
end
'''
    units = _by_name(extract_units("comp.jl", src))
    assert units["total"].unit_type == UnitType.FUNCTION
    assert units["total"].end_line == 4
    assert units["first_elem"].end_line == 8
    assert units["guarded"].end_line == 13


def test_julia_paren_generator():
    """Generator expressions in parentheses (`sum(x for x in xs)`) are the
    same comprehension hazard as square brackets (round-3 review #2)."""
    src = '''function total(xs)
    s = sum(2x for x in xs)
    return s
end

function also_fine(xs)
    return maximum(x * x for x in xs if x > 0)
end
'''
    units = _by_name(extract_units("gen.jl", src))
    assert units["total"].end_line == 4
    assert units["also_fine"].end_line == 8


def test_elixir_extraction():
    src = '''defmodule Geometry.Circle do
  @moduledoc "Circles."

  import Kernel

  def area(radius) when radius > 0 do
    3.14159 * radius * radius
  end

  def area(_), do: 0.0

  defp validate!(r) do
    if r < 0 do
      raise ArgumentError
    end
    r
  end

  def sum_areas(radii) do
    radii
    |> Enum.map(fn r -> area(validate!(r)) end)
    |> Enum.sum()
  end
end
'''
    units = extract_units("circle.ex", src)
    mods = [u for u in units if u.unit_type == UnitType.CLASS]
    assert mods and mods[0].name == "Geometry.Circle"
    assert mods[0].end_line == 24
    by = _by_name(units)
    a = by["area"]  # block form wins the name slot or the one-liner; both exist
    areas = [u for u in units if u.name == "area"]
    assert len(areas) == 2  # guard-clause form + `, do:` one-liner
    v = by["validate!"]
    assert v.unit_type == UnitType.METHOD
    assert v.has_branches and v.has_error_handling
    s = by["sum_areas"]
    assert "area" in s.calls and "map" in s.calls
    assert "Kernel" in s.imports


def test_elixir_block_do_with_atom_body():
    """A block `do` whose body starts with an atom (`do\\n :ok`) must not
    be misread as the `, do:` keyword form — that truncated the enclosing
    module's extent (round-3 review)."""
    src = '''defmodule M do
  def ok_fun do
    :ok
  end

  def after_fun(x) do
    x + 1
  end
end
'''
    units = extract_units("m.ex", src)
    by = _by_name(units)
    assert by["M"].end_line == 9
    assert by["ok_fun"].end_line == 4
    af = by["after_fun"]
    assert af.end_line == 8
    assert af.qualified_name == "M.after_fun"
    # keyword one-liner still excluded from block pairing
    src2 = "defmodule N do\n  def one(x), do: x + 1\nend\n"
    by2 = _by_name(extract_units("n.ex", src2))
    assert by2["N"].end_line == 3
    assert by2["one"].unit_type == UnitType.METHOD


def test_elixir_comma_free_keyword_do():
    """`quote do: expr` and `foo(do: x)` are keyword forms WITHOUT a
    preceding comma — only the adjacent-colon rule classifies them
    correctly (round-3 review #1)."""
    src = '''defmodule M do
  defmacro mac(x) do
    quote do: unquote(x) + 1
  end

  def later(y) do
    y * 2
  end
end
'''
    by = _by_name(extract_units("mac.ex", src))
    assert by["M"].end_line == 9
    assert by["mac"].end_line == 4
    assert by["later"].end_line == 8
    # One-line BLOCK form (space after do) still pairs with its end.
    src2 = "defmodule P do\n  def f do :ok end\nend\n"
    by2 = _by_name(extract_units("p.ex", src2))
    assert by2["P"].end_line == 3
    assert by2["f"].end_line == 2


def test_r_extraction():
    src = '''library(stats)

# Root mean square.
rms <- function(x) {
  if (length(x) == 0) {
    return(0)
  }
  sqrt(mean(x^2))
}

zscore = function(x, mu, sd) {
  for (i in seq_along(x)) {
    x[i] <- (x[i] - mu) / sd
  }
  x
}

Point <- R6Class("Point",
  public = list(
    x = 0
  )
)

setClass("Shape", representation(area = "numeric"))
'''
    units = _by_name(extract_units("stats.r", src))
    r = units["rms"]
    assert r.unit_type == UnitType.FUNCTION
    assert r.parameters == ["x"]
    assert "Root mean square" in r.docstring
    assert r.has_branches and "sqrt" in r.calls
    z = units["zscore"]
    assert z.parameters == ["x", "mu", "sd"]
    assert z.has_loops
    assert units["Point"].unit_type == UnitType.CLASS
    assert units["Shape"].unit_type == UnitType.CLASS
    assert "stats" in r.imports


def test_zig_extraction():
    src = '''const std = @import("std");

pub const Vec2 = struct {
    x: f32,
    y: f32,

    pub fn dot(a: Vec2, b: Vec2) f32 {
        return a.x * b.x + a.y * b.y;
    }
};

fn clamp(v: f32, lo: f32, hi: f32) f32 {
    if (v < lo) return lo;
    if (v > hi) return hi;
    return v;
}

test "clamp works" {
    try std.testing.expect(clamp(5, 0, 1) == 1);
}
'''
    units = _by_name(extract_units("vec.zig", src))
    v = units["Vec2"]
    assert v.unit_type == UnitType.CLASS
    d = units["dot"]
    assert d.unit_type == UnitType.METHOD
    assert d.parent_class == "Vec2"
    assert d.parameters == ["a", "b"]
    assert d.return_type == "f32"
    c = units["clamp"]
    assert c.unit_type == UnitType.FUNCTION
    assert c.parameters == ["v", "lo", "hi"]
    assert c.has_branches and c.complexity >= 3
    t = units["clamp works"]
    assert "clamp" in t.calls
    assert "std" in t.imports


def test_haskell_extraction():
    src = '''module Geometry (area) where

import Data.List (foldl')

data Shape = Circle Double | Square Double
  deriving (Show, Eq)

-- | Area of a shape.
area :: Shape -> Double
area (Circle r) = pi * r * r
area (Square s) = s * s

totalArea :: [Shape] -> Double
totalArea xs = foldl' step 0 xs
  where
    step acc s = acc + area s
'''
    units = _by_name(extract_units("Geometry.hs", src))
    s = units["Shape"]
    assert s.unit_type == UnitType.CLASS
    a = units["area"]
    assert a.unit_type == UnitType.FUNCTION
    assert "Area of a shape" in a.docstring
    assert a.return_type == "Double"
    assert a.line == 9 and a.end_line == 11  # sig + both equations, one unit
    ta = units["totalArea"]
    assert "xs" in ta.parameters
    assert "foldl'" in ta.calls  # prime identifier lexed as one name
    assert "Data" in ta.imports


def test_ocaml_extraction():
    src = """open List

(* A 2D point. *)
type point = { x : float; y : float }

let dot a b = (a.x *. b.x) +. (a.y *. b.y)

let rec sum_norms pts =
  match pts with
  | [] -> 0.0
  | p :: rest -> sqrt (dot p p) +. sum_norms rest

module Geometry = struct
  let origin = { x = 0.0; y = 0.0 }

  let distance a b =
    let dx = a.x -. b.x in
    let dy = a.y -. b.y in
    sqrt ((dx *. dx) +. (dy *. dy))
end
"""
    units = _by_name(extract_units("geo.ml", src))
    assert units["point"].unit_type == UnitType.CLASS
    d = units["dot"]
    assert d.unit_type == UnitType.FUNCTION
    assert d.parameters == ["a", "b"]
    sn = units["sum_norms"]
    assert "sqrt" in sn.calls and "dot" in sn.calls
    g = units["Geometry"]
    assert g.unit_type == UnitType.CLASS
    dist = units["distance"]
    assert dist.unit_type == UnitType.METHOD
    assert dist.parent_class == "Geometry"
    # inner `let dx = ... in` must NOT become its own unit
    assert "dx" not in units and "dy" not in units
    assert dist.end_line >= 19
    assert "List" in d.imports


def test_sql_extraction():
    src = """-- Users schema.
CREATE TABLE users (
    id BIGSERIAL PRIMARY KEY,
    email TEXT NOT NULL UNIQUE
);

CREATE INDEX idx_users_email ON users (email);

CREATE OR REPLACE FUNCTION user_count(min_age INT)
RETURNS BIGINT AS $$
BEGIN
    RETURN (SELECT count(*) FROM users WHERE age >= min_age);
END;
$$ LANGUAGE plpgsql;

CREATE VIEW active_users AS
SELECT * FROM users WHERE active = true;
"""
    units = _by_name(extract_units("schema.sql", src))
    t = units["users"]
    assert t.unit_type == UnitType.CLASS
    assert "Users schema" in t.docstring
    f = units["user_count"]
    assert f.unit_type == UnitType.FUNCTION
    assert f.parameters == ["min_age"]
    # the $$ body's inner `;` must not end the statement early
    assert f.end_line == 14
    v = units["active_users"]
    assert v.unit_type == UnitType.CLASS
    assert units["idx_users_email"].unit_type == UnitType.CONSTANT


def test_css_extraction():
    src = """/* Base layout */
.container {
  display: flex;
}

#header h1, .brand {
  font-weight: bold;
}

@media (max-width: 600px) {
  .container {
    flex-direction: column;
  }
}
"""
    units = extract_units("style.css", src)
    names = [u.name for u in units]
    assert ".container" in names
    assert "#header h1, .brand" in names
    assert "@media (max-width: 600px)" in names
    media_inner = [
        u for u in units if u.name == ".container" and u.line > 9
    ]
    assert media_inner and media_inner[0].parent_class in (
        None, "@media (max-width: 600px)"
    )


def test_qml_extraction():
    src = """import QtQuick 2.15

Rectangle {
    id: root
    width: 320

    signal activated(string name)

    function describe(prefix) {
        if (root.width > 100) {
            return prefix + ": wide"
        }
        return prefix + ": narrow"
    }

    Text {
        id: label
        text: describe("box")
    }
}
"""
    units = _by_name(extract_units("Box.qml", src))
    r = units["Rectangle"]
    assert r.unit_type == UnitType.CLASS
    d = units["describe"]
    assert d.unit_type == UnitType.METHOD
    assert d.parent_class == "Rectangle"
    assert d.parameters == ["prefix"]
    assert d.has_branches
    assert units["activated"].unit_type == UnitType.FUNCTION
    assert units["Text"].unit_type == UnitType.CLASS
    assert "QtQuick" in r.imports


def test_vue_sfc_extraction():
    src = """<template>
  <div class="counter">
    <button id="inc" @click="increment">{{ count }}</button>
  </div>
</template>

<script lang="ts">
function format(n: number): string {
  return n.toFixed(2)
}
</script>

<style>
.counter { padding: 4px; }
</style>
"""
    units = extract_units("Counter.vue", src)
    by = _by_name(units)
    f = by["format"]
    assert f.unit_type == UnitType.FUNCTION
    assert f.language == "typescript"
    assert f.line == 8 and f.end_line == 10  # host-file line numbers
    assert ".counter" in by
    doc = by["Counter"]
    assert doc.unit_type == UnitType.DOCUMENT
    assert doc.language == "vue"


def test_svelte_extraction():
    src = """<script>
  let count = 0
  function increment() {
    count += 1
  }
</script>

<button id="counter" on:click={increment}>{count}</button>
"""
    units = _by_name(extract_units("Counter.svelte", src))
    inc = units["increment"]
    assert inc.unit_type == UnitType.FUNCTION
    assert inc.line == 3
    assert units["Counter"].unit_type == UnitType.DOCUMENT


def test_html_extraction():
    src = """<!doctype html>
<html>
<head><title>Dashboard</title>
<script>
function refresh(panel) {
  fetch('/api')
}
</script>
</head>
<body><div id="main"></div></body>
</html>
"""
    units = _by_name(extract_units("index.html", src))
    r = units["refresh"]
    assert r.unit_type == UnitType.FUNCTION
    assert r.line == 5
    assert "fetch" in r.calls
    doc = units["Dashboard"]
    assert doc.unit_type == UnitType.DOCUMENT
    assert "main" in doc.variables


# ---------------------------------------------------------------------------
# Round-4 adversarial fixtures: nesting, object literals, generics, strings
# with braces, var-bound closures (VERDICT item 8; ref extract.rs:1-825)
# ---------------------------------------------------------------------------


def test_js_methods_in_classes_in_closures():
    src = """
function outer() {
  class Inner {
    method(x) { return x; }
  }
  const nested = (a) => (b) => { return a + b; };
  return Inner;
}
"""
    units = _by_name(extract_units("a.js", src))
    assert units["outer"].unit_type == UnitType.FUNCTION
    assert units["Inner"].unit_type == UnitType.CLASS
    assert units["method"].parent_class == "Inner"
    assert units["nested"].unit_type == UnitType.FUNCTION


def test_js_braces_inside_strings_regex_templates():
    src = """
const re = /}{/g;
const s = `template ${ {a:1}.a } }{ text`;
const c = "}{ not structure";
function afterAll(a) { return a; }
"""
    units = _by_name(extract_units("a.js", src))
    a = units["afterAll"]
    assert a.line == 5 and a.end_line == 5


def test_js_object_literal_methods_and_arrow_props():
    src = """
const obj = {
  method(a) { return a; },
  arrow: (b) => b * 2,
  async asyncMethod(c) { return c; },
  plain: 42,
};
function after() { return 1; }
"""
    units = _by_name(extract_units("a.js", src))
    assert units["method"].parent_class == "obj"
    assert units["arrow"].parent_class == "obj"
    assert units["asyncMethod"].parent_class == "obj"
    assert "plain" not in units
    assert units["after"].unit_type == UnitType.FUNCTION


def test_ts_generic_method_with_object_type_bound():
    src = """
function generic<T extends {a: number}>(x: T): T { return x; }
class Box<K extends string> {
  get<V extends {b: boolean}>(k: K): V { return null as any; }
}
"""
    units = _by_name(extract_units("a.ts", src))
    assert units["generic"].unit_type == UnitType.FUNCTION
    assert units["get"].parent_class == "Box"


def test_ts_arrow_props_with_return_annotations():
    src = """
const handlers = {
  onClick: async (e: Event): Promise<void> => { await submit(e); },
  onKey: e => e.key,
};
"""
    units = _by_name(extract_units("a.ts", src))
    assert units["onClick"].parent_class == "handlers"
    assert units["onKey"].parent_class == "handlers"
    assert "submit" in units["onClick"].calls


def test_go_var_bound_closures_and_string_braces():
    src = """
func Outer() func() int {
	inner := func() int { return 1 }
	s := "}{ not a brace"
	return inner
}

func (t *T) Method(a int) int { return a }
"""
    units = _by_name(extract_units("a.go", src))
    assert units["Outer"].unit_type == UnitType.FUNCTION
    assert units["Outer"].end_line == 6
    assert units["inner"].unit_type == UnitType.FUNCTION
    assert units["Method"].parent_class == "T"


def test_js_no_recognizer_misfires_on_calls_and_branches():
    """Calls followed by blocks, branches, and ternary object literals must
    never surface as units."""
    src = """
function normal() {
  if (x) { doThing(y); }
  while (cond) { step(); }
  helper(a, b);
  const t = cond ? {k: 1} : other;
  it('case', () => { expect(1).toBe(1); });
}
"""
    units = _by_name(extract_units("a.js", src))
    assert set(units) == {"normal"}


def test_rust_impl_generics_and_trait_default_methods():
    """impl<T> Repo<T> must parent methods to Repo (not the type param);
    trait default methods parent to the trait (extract.rs impl/trait
    handling)."""
    src = """
impl<T: Clone> Repo<T> where T: Send {
    pub fn get(&self, id: u64) -> Option<T> { None }
}
impl Store for Repo<u8> {
    fn put(&self, v: &str) -> bool { true }
}
trait Store {
    fn put_default(&self, v: &str) -> bool { v.len() > 0 }
}
"""
    units = _by_name(extract_units("a.rs", src))
    assert units["get"].parent_class == "Repo"
    assert units["put"].parent_class == "Repo"
    assert units["put_default"].parent_class == "Store"
    assert units["put_default"].unit_type == UnitType.METHOD


def test_csharp_expression_bodies_and_records():
    """Expression-bodied members (=> expr;) and positional records — both
    body-less and brace-bodied with a base ctor call — are modern-C#
    staples the token parser must extract."""
    src = """
namespace App.Core {
    public class Service : IService {
        public async Task<int> GetAsync(int id) => await Fetch(id);
        public int Sum(int a, int b) { return a + b; }
    }
    public record Point(int X, int Y);
    public record Circle(double R) : Shape(R) {
        public double Area() => 3.14 * R * R;
    }
}
"""
    units = _by_name(extract_units("a.cs", src))
    assert units["GetAsync"].parent_class == "Service"
    assert units["GetAsync"].unit_type == UnitType.METHOD
    assert units["Point"].unit_type == UnitType.CLASS
    assert units["Circle"].unit_type == UnitType.CLASS
    assert units["Area"].parent_class == "Circle"


def test_cpp_in_class_methods_full_fidelity():
    """In-class C++ definitions: constructor with initializer list (paren
    AND brace inits), destructor, const/noexcept qualifiers, trailing
    return, template method, overloaded operators."""
    src = """
class Matrix {
 public:
  Matrix(int n) : n_(n), data_{nullptr} {}
  ~Matrix() { release(); }
  int size() const noexcept { return n_; }
  auto rows() const -> int { return n_; }
  template <typename T>
  T scale(T v) { return v * n_; }
  Matrix& operator+=(const Matrix& o) { return *this; }
  bool operator==(const Matrix& o) const { return n_ == o.n_; }
 private:
  int n_;
  int* data_;
};
auto trailing_free() -> int { return 1; }
"""
    units = _by_name(extract_units("a.cpp", src))
    for name in ("Matrix", "~Matrix", "size", "rows", "scale",
                 "operator+=", "operator=="):
        assert name in units, name
        if name != "Matrix":
            assert units[name].parent_class == "Matrix", name
    assert units["size"].return_type == "int"
    assert units["scale"].return_type == "T"
    assert units["trailing_free"].unit_type == UnitType.FUNCTION


def test_cpp_no_misfires_on_calls_and_decls():
    """Calls, local declarations, and forward declarations inside class or
    function bodies must not surface as definitions."""
    src = """
class W {
 public:
  void process() {
    helper(1, 2);
    Matrix m(3);
    int y = compute(m);
    if (check(y)) { emit(y); }
  }
  int forward_decl(int a);
};
"""
    units = _by_name(extract_units("a.cpp", src))
    assert set(units) == {"W", "process"}
    assert units["process"].parent_class == "W"


def test_kotlin_primary_ctor_with_base_call():
    """class Repo(val db: Db) : Base(db) { ... } — the superclass
    constructor CALL must not abort class recognition."""
    src = """
class Repo(val db: Db) : Base(db) {
    fun find(id: Long): Row? { return db.get(id) }
}
"""
    units = _by_name(extract_units("a.kt", src))
    assert units["Repo"].unit_type == UnitType.CLASS
    assert units["find"].parent_class == "Repo"


# ---------------------------------------------------------------------------
# Call-graph fixture parity for the 5 priority languages (VERDICT r4 #8)
# ---------------------------------------------------------------------------


def test_call_graph_edges_js_ts_go_rust_java():
    """calls AND called_by edges for JS/TS/Go/Rust/Java: a helper called by
    two functions records both callers; a caller records all its callees
    (ref colgrep/src/parser/call_graph.rs)."""
    fixtures = {
        "a.js": """
function helper(x) { return x + 1; }
function alpha(v) { return helper(v) * 2; }
function beta(v) { if (v) { return helper(v) - 1; } return 0; }
""",
        "a.ts": """
function helper(x: number): number { return x + 1; }
function alpha(v: number): number { return helper(v) * 2; }
function beta(v: number): number { return v ? helper(v) : 0; }
""",
        "a.go": """package main

func helper(x int) int { return x + 1 }

func alpha(v int) int {
\treturn helper(v) * 2
}

func beta(v int) int {
\tif v > 0 {
\t\treturn helper(v) - 1
\t}
\treturn 0
}
""",
        "a.rs": """
fn helper(x: i32) -> i32 { x + 1 }

fn alpha(v: i32) -> i32 {
    helper(v) * 2
}

fn beta(v: i32) -> i32 {
    if v > 0 { helper(v) - 1 } else { 0 }
}
""",
        "A.java": """
public class A {
    static int helper(int x) { return x + 1; }

    static int alpha(int v) {
        return helper(v) * 2;
    }

    static int beta(int v) {
        if (v > 0) { return helper(v) - 1; }
        return 0;
    }
}
""",
    }
    for path, src in fixtures.items():
        units = _by_name(extract_units(path, src))
        assert "helper" in units, (path, sorted(units))
        assert "helper" in units["alpha"].calls, path
        assert "helper" in units["beta"].calls, path
        assert set(units["helper"].called_by) >= {"alpha", "beta"}, (
            path, units["helper"].called_by
        )


# ---------------------------------------------------------------------------
# Fuzz: random/adversarial token soup through every lexer config
# ---------------------------------------------------------------------------


def test_fuzz_token_soup_no_crash_no_phantom_units():
    """Random and adversarial inputs through every _LEX language: the
    parser must never crash, every returned unit must have a sane extent,
    and no FUNCTION/CLASS/METHOD unit may be invented whose name does not
    appear in the source (phantom units poison the embedding index)."""
    import random

    from nextplaid_tpu.codesearch.structparse import _LEX

    ext = {
        "c": "f.c", "cpp": "f.cpp", "csharp": "f.cs", "css": "f.css",
        "elixir": "f.ex", "go": "f.go", "haskell": "f.hs", "java": "F.java",
        "javascript": "f.js", "julia": "f.jl", "kotlin": "f.kt",
        "lua": "f.lua", "ocaml": "f.ml", "php": "f.php", "qml": "f.qml",
        "r": "f.r", "ruby": "f.rb", "rust": "f.rs", "scala": "f.scala",
        "sql": "f.sql", "swift": "f.swift", "typescript": "f.ts",
        "zig": "f.zig",
    }
    assert set(ext) == set(_LEX)

    pieces = [
        "fn", "func", "def", "function", "class", "struct", "impl",
        "end", "{", "}", "(", ")", "[", "]", ";", ":", "::", "->", "=>",
        "=", ":=", "\"unterminated", "'x'", "'", "`tpl ${", "/*", "*/",
        "//", "#", "--", '"""', "[[", "]]", "<<<EOT", "$$", "\\\\", "~",
        "@", "0x1f", "1e9", "...", "..", ",", ".", "r#\"", "\"#", "?",
        "foo", "Bar", "baz_qux", "名前", "\t", "\n\n", " ",
    ]
    rng = random.Random(42)
    for language, path in ext.items():
        samples = []
        for _ in range(8):
            samples.append(" ".join(
                rng.choice(pieces)
                for _ in range(rng.randrange(5, 200))
            ))
        # Adversarial: deep unbalanced nesting, comment/string bombs.
        samples += [
            "{" * 400,
            ")" * 400 + "(" * 400,
            "/*" * 200,
            '"' + "a" * 5000,
            "def " * 300,
            "\x00\x01\x02 binary \xff garbage",
            "",
        ]
        for src in samples:
            units = extract_units(path, src)  # must not raise
            n_lines = len(src.splitlines())
            for u in units:
                assert 1 <= u.line <= max(n_lines, 1), (language, u)
                assert u.line <= u.end_line <= max(n_lines, 1) + 1, (
                    language, u
                )
                if u.unit_type in (
                    UnitType.FUNCTION, UnitType.METHOD, UnitType.CLASS
                ):
                    # Name must come from the source (allowing the parser's
                    # own prefixes like "~dtor" / "operator+").
                    stem = u.name.lstrip("~").split("operator")[-1] or u.name
                    assert stem in src or u.name in src, (
                        language, u.name, src[:80]
                    )


def test_call_graph_edges_cpp_csharp_kotlin_ruby_swift():
    """Round-5 widening of the call-graph fixture parity to C++/C#/Kotlin/
    Ruby/Swift — the called_by resolver is language-agnostic (parser.py
    _resolve_called_by over _analyze's layer-2 calls), so every lexer
    language must produce the same helper<-{alpha,beta} edges."""
    fixtures = {
        "a.cpp": """
int helper(int x) { return x + 1; }

int alpha(int v) {
    return helper(v) * 2;
}

int beta(int v) {
    if (v > 0) { return helper(v) - 1; }
    return 0;
}
""",
        "A.cs": """
public class A {
    static int helper(int x) { return x + 1; }

    static int alpha(int v) {
        return helper(v) * 2;
    }

    static int beta(int v) {
        if (v > 0) { return helper(v) - 1; }
        return 0;
    }
}
""",
        "a.kt": """
fun helper(x: Int): Int = x + 1

fun alpha(v: Int): Int {
    return helper(v) * 2
}

fun beta(v: Int): Int {
    if (v > 0) { return helper(v) - 1 }
    return 0
}
""",
        "a.rb": """
def helper(x)
  x + 1
end

def alpha(v)
  helper(v) * 2
end

def beta(v)
  return helper(v) - 1 if v > 0
  0
end
""",
        "a.swift": """
func helper(_ x: Int) -> Int { return x + 1 }

func alpha(_ v: Int) -> Int {
    return helper(v) * 2
}

func beta(_ v: Int) -> Int {
    if v > 0 { return helper(v) - 1 }
    return 0
}
""",
    }
    for path, src in fixtures.items():
        units = _by_name(extract_units(path, src))
        assert "helper" in units, (path, sorted(units))
        assert "helper" in units["alpha"].calls, path
        assert "helper" in units["beta"].calls, path
        assert set(units["helper"].called_by) >= {"alpha", "beta"}, (
            path, units["helper"].called_by
        )

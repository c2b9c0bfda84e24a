r"""VRL source -> AST: lexer + recursive-descent parser.

Implements the expression-language subset of the reference's VRL parser
(lib/vrl/parser/src/parser.lalrpop, token rules lib/vrl/parser/src/lex.rs)
so remap programs can be written as VRL *source* and compiled to native
Spark Columns (vrl_codegen.py). Grammar fidelity notes:

- operator tiers copied from parser.lalrpop:254-307 (loosest->tightest):
  ``??``  <  ``||``/``&&``  <  ``==``/``!=``  <  ``>= > <= <``  <
  ``|`` (object merge)  <  ``+ -``  <  ``* /``  <  ``!`` (not)  < term;
  all binary tiers left-associative.
- statements separated by newline or ``;`` (parser.lalrpop:449-452);
  newlines are non-terminal (skippable) inside ``(``/``[``, after commas,
  after binary operators and after an opening ``{``.
- string escapes ``\' \" \\ \n \r \t \{ \}`` plus line-continuation
  ``\<newline>`` (lex.rs unescape_string_literal); ``{{ ident }}``
  template segments (lex.rs:601-666) become Template nodes.
- literals: ``"..."`` (template string), ``s'...'`` raw string,
  ``r'...'`` regex, ``t'...'`` timestamp, integer, float, true/false/null.
- queries (parser.lalrpop:322-372): ``.a.b[0]``, ``."quoted field"``,
  root ``.``, variable paths ``x.a``, call-result paths ``f().a`` and
  path coalescing ``.(a|b)``; ``%metadata`` paths (the event's second
  namespace, lib/vrl/parser/src/lex.rs PathField after ``%``) parse to
  ``("meta", path)`` targets / ``Query(("meta",), path)`` terms — the
  codegen carries them as a per-event scratch namespace.
- assignment (parser.lalrpop:221-252): single target, ``ok, err =``
  infallible pattern, ``_`` no-op target, ``=`` and ``|=``.
- function calls with the ``!`` abort-on-error marker and named
  arguments; closures (``-> |x| {...}``) parse to a node the codegen
  handles per-function or rejects.
- ``if`` / ``else if`` / ``else`` (desugared as parser.lalrpop:420-446),
  ``abort`` with optional message (ast.rs Abort).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class VrlParseError(ValueError):
    pass


class VrlUnsupported(NotImplementedError):
    """Construct is valid VRL but outside this compiler's subset."""


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------


@dataclass
class Template:
    """String literal as alternating segments.

    segments: list of ("lit", str) | ("var", ident)
    """

    segments: list

    @property
    def literal(self) -> str | None:
        if all(k == "lit" for k, _ in self.segments):
            return "".join(s for _, s in self.segments)
        return None


@dataclass
class Lit:
    kind: str  # string|rawstring|int|float|bool|null|regex|timestamp
    value: object


@dataclass
class Arr:
    items: list


@dataclass
class Obj:
    pairs: list  # [(str_key, expr)]


@dataclass
class Block:
    stmts: list


@dataclass
class Var:
    name: str


@dataclass
class Query:
    # target: ("event",) | ("var", name) | ("expr", node)
    target: tuple
    path: list  # [("field", name) | ("index", int) | ("coalesce", [names])]


@dataclass
class FnCall:
    name: str
    bang: bool
    args: list  # [(name|None, expr)]
    closure: object = None  # (params: [str], body: Block) | None


@dataclass
class If:
    pred: object
    then: Block
    orelse: object = None  # Block | None


@dataclass
class Op:
    op: str
    lhs: object
    rhs: object


@dataclass
class Not:
    expr: object


@dataclass
class Assign:
    # each target: ("noop",) | ("event", path) | ("var", name, path)
    targets: list
    op: str  # "=" | "|="
    expr: object


@dataclass
class Abort:
    message: object = None


@dataclass
class Program:
    stmts: list = field(default_factory=list)


# --------------------------------------------------------------------------
# Lexer
# --------------------------------------------------------------------------

_KEYWORDS = {"if", "else", "true", "false", "null", "abort"}
# multi-char operators first (maximal munch)
_OPS = [
    "??", "||", "&&", "==", "!=", ">=", "<=", "|=", "->",
    ">", "<", "|", "+", "-", "*", "/", "!", "=", ",", ";", ":",
    "(", ")", "[", "]", "{", "}", ".", "%", "_",
]

_VALUE_END = {"INT", "FLOAT", "STRING", "RAWSTRING", "REGEX", "TIMESTAMP",
              "IDENT", ")", "]", "}", "true", "false", "null"}


@dataclass
class Tok:
    kind: str  # NEWLINE | IDENT | INT | FLOAT | STRING | RAWSTRING | REGEX
    #            | TIMESTAMP | keyword | operator | EOF
    value: object
    pos: int


def _unescape_into(out: list, src: str, i: int, quote: str) -> int:
    """Consume one escape sequence at src[i] == '\\'; append to out."""
    if i + 1 >= len(src):
        raise VrlParseError("dangling escape at end of input")
    c = src[i + 1]
    if c == "\n":  # line continuation: swallow newline + following ws
        j = i + 2
        while j < len(src) and src[j] in " \t":
            j += 1
        return j
    mapping = {"'": "'", '"': '"', "\\": "\\", "n": "\n", "r": "\r",
               "t": "\t", "{": "{", "}": "}"}
    if c not in mapping:
        raise VrlParseError(f"invalid escape character: \\{c}")
    out.append(mapping[c])
    return i + 2


def _lex_template_string(src: str, i: int) -> tuple[Template, int]:
    """Lex a double-quoted string starting after the opening quote."""
    segments: list = []
    cur: list = []
    while True:
        if i >= len(src):
            raise VrlParseError("unterminated string literal")
        c = src[i]
        if c == '"':
            i += 1
            break
        if c == "\\":
            i = _unescape_into(cur, src, i, '"')
            continue
        if c == "{" and src.startswith("{{", i):
            j = src.find("}}", i + 2)
            if j < 0:
                raise VrlParseError("unterminated {{ template segment")
            name = src[i + 2:j].strip()
            if not name.isidentifier():
                raise VrlUnsupported(f"non-identifier template segment: {name!r}")
            if cur:
                segments.append(("lit", "".join(cur)))
                cur = []
            segments.append(("var", name))
            i = j + 2
            continue
        cur.append(c)
        i += 1
    if cur or not segments:
        segments.append(("lit", "".join(cur)))
    return Template(segments), i


def _lex_single_quoted(src: str, i: int) -> tuple[str, int]:
    out: list = []
    while True:
        if i >= len(src):
            raise VrlParseError("unterminated single-quoted literal")
        c = src[i]
        if c == "'":
            return "".join(out), i + 1
        if c == "\\" and i + 1 < len(src) and src[i + 1] == "'":
            out.append("'")
            i += 2
            continue
        out.append(c)
        i += 1


def lex(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r":
            i += 1
            continue
        if c == "#":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == "\n":
            # newlines are always emitted; the parser skips them where the
            # grammar marks them non-terminal (multi-statement predicate
            # groups NEED them even inside parens — parser.lalrpop:456)
            if toks and toks[-1].kind != "NEWLINE":
                toks.append(Tok("NEWLINE", None, i))
            i += 1
            continue
        if c == '"':
            tmpl, i = _lex_template_string(src, i + 1)
            toks.append(Tok("STRING", tmpl, i))
            continue
        if c in "srt" and i + 1 < n and src[i + 1] == "'":
            body, i = _lex_single_quoted(src, i + 2)
            kind = {"s": "RAWSTRING", "r": "REGEX", "t": "TIMESTAMP"}[c]
            toks.append(Tok(kind, body, i))
            continue
        if c.isdigit() or (
            c == "-"
            and i + 1 < n
            and src[i + 1].isdigit()
            and (not toks or toks[-1].kind not in _VALUE_END)
        ):
            j = i + 1
            while j < n and (src[j].isdigit() or src[j] == "_"):
                j += 1
            is_float = False
            if j < n and src[j] == "." and j + 1 < n and src[j + 1].isdigit():
                is_float = True
                j += 1
                while j < n and (src[j].isdigit() or src[j] == "_"):
                    j += 1
            if j < n and src[j] in "eE":
                k = j + 1
                if k < n and src[k] in "+-":
                    k += 1
                if k < n and src[k].isdigit():
                    is_float = True
                    j = k
                    while j < n and src[j].isdigit():
                        j += 1
            text = src[i:j].replace("_", "")
            toks.append(
                Tok("FLOAT", float(text), i) if is_float else Tok("INT", int(text), i)
            )
            i = j
            continue
        if c.isalpha() or c in "_@":
            # '@' is legal in bare path fields (lexer "path field" token);
            # it can never begin a variable/function name in valid VRL, so
            # folding it into IDENT only widens path parsing.
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_@"):
                j += 1
            word = src[i:j]
            if word == "_" :
                toks.append(Tok("_", None, i))
            elif word in _KEYWORDS:
                toks.append(Tok(word, None, i))
            else:
                toks.append(Tok("IDENT", word, i))
            i = j
            continue
        for op in _OPS:
            if src.startswith(op, i):
                toks.append(Tok(op, None, i))
                i += len(op)
                break
        else:
            raise VrlParseError(f"unexpected character {c!r} at offset {i}")
    toks.append(Tok("EOF", None, n))
    return toks


# --------------------------------------------------------------------------
# Parser
# --------------------------------------------------------------------------


class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    # -- token helpers ----------------------------------------------------
    def peek(self, off: int = 0) -> Tok:
        return self.toks[min(self.i + off, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def at(self, *kinds: str) -> bool:
        return self.peek().kind in kinds

    def eat(self, kind: str) -> Tok:
        t = self.peek()
        if t.kind != kind:
            raise VrlParseError(f"expected {kind}, got {t.kind} at offset {t.pos}")
        return self.next()

    def skip_nl(self) -> None:
        while self.at("NEWLINE"):
            self.next()

    def _is_call_start(self) -> bool:
        """IDENT '(' or IDENT '!' '(' begins a function call."""
        if not self.at("IDENT"):
            return False
        nxt = self.peek(1).kind
        return nxt == "(" or (nxt == "!" and self.peek(2).kind == "(")

    def peek_skip_nl(self) -> Tok:
        j = self.i
        while self.toks[j].kind == "NEWLINE":
            j += 1
        return self.toks[j]

    # -- program ----------------------------------------------------------
    def program(self) -> Program:
        stmts = []
        self.skip_nl()
        while not self.at("EOF"):
            stmts.append(self.statement())
            if self.at("NEWLINE", ";"):
                self.next()
                self.skip_nl()
                while self.at(";"):
                    self.next()
                    self.skip_nl()
            elif not self.at("EOF"):
                t = self.peek()
                raise VrlParseError(
                    f"expected end of statement, got {t.kind} at offset {t.pos}"
                )
        return Program(stmts)

    def statement(self):
        if self.at("abort"):
            return self._abort()
        save = self.i
        try:
            targets = self._assign_targets()
            op = self.peek().kind
            if targets is not None and op in ("=", "|="):
                self.next()
                self.skip_nl()
                expr = self.expr()
                return Assign(targets, op, expr)
        except VrlParseError:
            pass
        self.i = save
        return self.expr()

    def _abort(self) -> Abort:
        self.eat("abort")
        if self.at("NEWLINE", ";", "EOF", "}"):
            return Abort(None)
        return Abort(self.expr())

    def _assign_targets(self):
        """Parse `target` or `target, target` followed by =/|= (caller checks)."""
        first = self._one_target()
        if first is None:
            return None
        if self.at(","):
            self.next()
            self.skip_nl()
            second = self._one_target()
            if second is None:
                raise VrlParseError("expected assignment target after comma")
            return [first, second]
        return [first]

    def _one_target(self):
        t = self.peek()
        if t.kind == "_":
            self.next()
            return ("noop",)
        if t.kind == ".":
            self.next()
            path = self._path(allow_empty=True)
            return ("event", path)
        if t.kind == "%":
            self.next()
            path = self._path(allow_empty=True)
            return ("meta", path)
        if t.kind == "IDENT":
            # variable target (with optional path) — but only if it is NOT
            # a function call
            if self._is_call_start():
                return None
            self.next()
            path = self._path(allow_empty=True)
            return ("var", t.value, path)
        return None

    # -- expressions (precedence tiers per parser.lalrpop:254-307) --------
    def expr(self):
        return self._coalesce()

    def _binary(self, sub, ops):
        lhs = sub()
        while self.peek().kind in ops:
            op = self.next().kind
            self.skip_nl()
            rhs = sub()
            lhs = Op(op, lhs, rhs)
        return lhs

    def _coalesce(self):
        return self._binary(self._logical, ("??",))

    def _logical(self):
        return self._binary(self._equal, ("||", "&&"))

    def _equal(self):
        return self._binary(self._compare, ("==", "!="))

    def _compare(self):
        return self._binary(self._merge, (">=", ">", "<=", "<"))

    def _merge(self):
        return self._binary(self._add, ("|",))

    def _add(self):
        return self._binary(self._factor, ("+", "-"))

    def _factor(self):
        return self._binary(self._not, ("*", "/"))

    def _not(self):
        if self.at("!"):
            self.next()
            return Not(self._not())
        return self._term()

    # -- terms ------------------------------------------------------------
    def _term(self):
        t = self.peek()
        if t.kind == "STRING":
            self.next()
            return self._maybe_path(Lit("string", t.value))
        if t.kind == "RAWSTRING":
            self.next()
            return Lit("rawstring", t.value)
        if t.kind == "REGEX":
            self.next()
            return Lit("regex", t.value)
        if t.kind == "TIMESTAMP":
            self.next()
            return Lit("timestamp", t.value)
        if t.kind == "INT":
            self.next()
            return Lit("int", t.value)
        if t.kind == "FLOAT":
            self.next()
            return Lit("float", t.value)
        if t.kind in ("true", "false"):
            self.next()
            return Lit("bool", t.kind == "true")
        if t.kind == "null":
            self.next()
            return Lit("null", None)
        if t.kind == "abort":
            return self._abort()
        if t.kind == "if":
            return self._if()
        if t.kind == "(":
            self.next()
            self.skip_nl()
            inner = self.statement()
            # multi-statement group is only valid as a predicate; handled there
            self.skip_nl()
            self.eat(")")
            return self._maybe_path(inner)
        if t.kind == "[":
            return self._maybe_path(self._array())
        if t.kind == "{":
            return self._maybe_path(self._object_or_block())
        if t.kind == ".":
            self.next()
            path = self._path(allow_empty=True)
            return Query(("event",), path)
        if t.kind == "%":
            self.next()
            path = self._path(allow_empty=True)
            return Query(("meta",), path)
        if t.kind == "IDENT":
            if self._is_call_start():
                call = self._call()
                return self._maybe_path(call)
            self.next()
            path = self._path(allow_empty=True)
            if path:
                return Query(("var", t.value), path)
            return Var(t.value)
        raise VrlParseError(f"unexpected token {t.kind} at offset {t.pos}")

    def _maybe_path(self, node):
        if self.at(".") and self.peek(1).kind in (
            "IDENT", "STRING", "(", "INT", *self._FIELD_KEYWORDS
        ):
            self.next()
            path = self._path(allow_empty=False, leading_field=True)
            return Query(("expr", node), path)
        if self.at("["):
            # only treat as index if it looks like [int]
            if self.peek(1).kind == "INT" and self.peek(2).kind == "]":
                path = self._path(allow_empty=False)
                return Query(("expr", node), path)
        return node

    def _path(self, allow_empty: bool, leading_field: bool = False) -> list:
        """Parse PathSegment+ (parser.lalrpop:362-372)."""
        segs: list = []
        first = True
        while True:
            if leading_field and first:
                seg = self._path_field()
                if seg is None:
                    raise VrlParseError("expected path field")
                segs.append(seg)
                first = False
                continue
            t = self.peek()
            if t.kind == "." and self.peek(1).kind in (
                "IDENT", "STRING", "(", "INT", *self._FIELD_KEYWORDS
            ):
                self.next()
                seg = self._path_field()
                if seg is None:
                    raise VrlParseError("expected field after '.'")
                segs.append(seg)
            elif (
                t.kind in ("IDENT", "STRING", *self._FIELD_KEYWORDS)
                and not segs
                and not first
            ):
                break
            elif (
                t.kind in ("IDENT", "STRING", *self._FIELD_KEYWORDS)
                and first
                and not segs
            ):
                # bare field directly after target token (e.g. `.foo`)
                seg = self._path_field()
                if seg is None:
                    break
                segs.append(seg)
            elif t.kind == "[" and self.peek(1).kind == "INT" and self.peek(2).kind == "]":
                self.next()
                idx = self.eat("INT").value
                self.eat("]")
                segs.append(("index", idx))
            elif t.kind == "(" and first and not segs:
                seg = self._path_field()
                if seg is None:
                    break
                segs.append(seg)
            else:
                break
            first = False
        if not segs and not allow_empty:
            raise VrlParseError("expected path")
        return segs

    _FIELD_KEYWORDS = ("true", "false", "null", "if", "else", "abort")

    def _path_field(self):
        t = self.peek()
        if t.kind == "IDENT":
            self.next()
            return ("field", t.value)
        if t.kind in self._FIELD_KEYWORDS:
            # reserved words are valid path fields (grammar AnyIdent)
            self.next()
            return ("field", t.kind)
        if t.kind == "INT" and self.peek(1).kind == "IDENT":
            # digit-leading "path field" token, e.g. .bar.0tar
            self.next()
            return ("field", str(t.value) + self.next().value)
        if t.kind == "STRING":
            self.next()
            lit = t.value.literal
            if lit is None:
                raise VrlUnsupported("templated path field")
            return ("field", lit)
        if t.kind == "(":
            # path coalescing .(a|b)
            self.next()
            names = []
            while True:
                ft = self.next()
                if ft.kind == "IDENT":
                    names.append(ft.value)
                elif ft.kind == "STRING" and ft.value.literal is not None:
                    names.append(ft.value.literal)
                elif ft.kind == "INT" and self.at("IDENT"):
                    # digit-leading "path field" token, e.g. .(a | 0bar)
                    names.append(str(ft.value) + self.next().value)
                elif ft.kind in self._FIELD_KEYWORDS:
                    names.append(ft.kind)
                else:
                    raise VrlParseError("expected field in path coalesce")
                if self.at("|"):
                    self.next()
                    continue
                self.eat(")")
                return ("coalesce", names)
        return None

    def _array(self) -> Arr:
        self.eat("[")
        self.skip_nl()
        items = []
        while not self.at("]"):
            items.append(self.expr())
            self.skip_nl()
            if self.at(","):
                self.next()
                self.skip_nl()
        self.eat("]")
        return Arr(items)

    def _object_or_block(self):
        # disambiguate: `{` [nl] STRING `:` -> object; `{` [nl] `}` -> object
        j = self.i + 1
        while self.toks[j].kind == "NEWLINE":
            j += 1
        if self.toks[j].kind == "}":
            self.next()
            self.skip_nl()
            self.eat("}")
            return Obj([])
        if self.toks[j].kind == "STRING" and self.toks[j + 1].kind == ":":
            return self._object()
        return self._block()

    def _object(self) -> Obj:
        self.eat("{")
        self.skip_nl()
        pairs = []
        while not self.at("}"):
            key_t = self.eat("STRING")
            key = key_t.value.literal
            if key is None:
                raise VrlUnsupported("templated object key")
            self.eat(":")
            self.skip_nl()
            pairs.append((key, self.expr()))
            self.skip_nl()
            if self.at(","):
                self.next()
                self.skip_nl()
        self.eat("}")
        return Obj(pairs)

    def _block(self) -> Block:
        self.eat("{")
        self.skip_nl()
        stmts = []
        while not self.at("}"):
            stmts.append(self.statement())
            if self.at("NEWLINE", ";"):
                self.next()
                self.skip_nl()
            elif not self.at("}"):
                t = self.peek()
                raise VrlParseError(
                    f"expected end of statement in block, got {t.kind} at {t.pos}"
                )
        self.eat("}")
        return Block(stmts)

    def _call(self) -> FnCall:
        name = self.eat("IDENT").value
        bang = False
        if self.at("!"):
            self.next()
            bang = True
        self.eat("(")
        self.skip_nl()
        args = []
        while not self.at(")"):
            arg_name = None
            if self.at("IDENT") and self.peek(1).kind == ":":
                arg_name = self.next().value
                self.next()
                self.skip_nl()
            args.append((arg_name, self.expr()))
            self.skip_nl()
            if self.at(","):
                self.next()
                self.skip_nl()
        self.eat(")")
        closure = None
        if self.at("->"):
            self.next()
            params = []
            if self.at("||"):
                self.next()
            else:
                self.eat("|")
                while not self.at("|"):
                    if self.at("_"):
                        self.next()
                        params.append("_")
                    else:
                        params.append(self.eat("IDENT").value)
                    if self.at(","):
                        self.next()
                self.eat("|")
            self.skip_nl()
            body = self._block()
            closure = (params, body)
        return FnCall(name, bang, args, closure)

    def _if(self) -> If:
        self.eat("if")
        pred = self._predicate()
        self.skip_nl()
        then = self._block()
        orelse = None
        # else / else if chains
        j = self.i
        while self.toks[j].kind == "NEWLINE":
            j += 1
        if self.toks[j].kind == "else":
            self.skip_nl()
            self.eat("else")
            self.skip_nl()
            if self.at("if"):
                nested = self._if()
                orelse = Block([nested])
            else:
                orelse = self._block()
        return If(pred, then, orelse)

    def _predicate(self):
        if self.at("("):
            # possibly a multi-statement predicate group
            save = self.i
            self.next()
            self.skip_nl()
            stmts = [self.statement()]
            multi = False
            while self.at("NEWLINE", ";"):
                self.next()
                self.skip_nl()
                if self.at(")"):
                    break
                stmts.append(self.statement())
                multi = True
            self.skip_nl()
            try:
                self.eat(")")
            except VrlParseError:
                self.i = save
                return self.expr()
            node = Block(stmts) if multi else stmts[0]
            # allow trailing operators after the group: `(a) || b`
            return self._pred_tail(node)
        return self.expr()

    def _pred_tail(self, node):
        while self.peek().kind in ("??", "||", "&&", "==", "!=", ">=", ">",
                                   "<=", "<", "|", "+", "-", "*", "/"):
            op = self.next().kind
            self.skip_nl()
            rhs = self._coalesce()
            node = Op(op, node, rhs)
        return node


def parse_vrl(source: str) -> Program:
    """Parse VRL source text into a Program AST."""
    return _Parser(lex(source)).program()

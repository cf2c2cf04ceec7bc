"""TeX -> operator tree -> leaf-root subpaths (reference tex-parser/ role).

A from-scratch recursive-descent parser over a practical TeX subset (the
reference uses a 530-line bison grammar + 975-line flex lexer,
tex-parser/grammar.y; we cover the operator classes its golden tests
exercise: +/- (ADD/NEG), implicit & explicit multiplication (TIMES),
fractions, division, sqrt/root, sub/superscripts, relations, function
classes like \\sum \\int \\sin, parens/braces, \\qvar wildcards, greek and
latin symbols).

Subpath model (math-index/subpath-set.c, math-index.h OPT_SUBPATH):
each LEAF contributes the path of operator tokens from itself to the root.
- unordered operators (ADD, TIMES, REL) carry no child rank => sibling
  order is not encoded => commutativity is free (a+b == b+a);
- ordered operators (FRAC, SUP, SUB, ROOT) append #rank so a/b != b/a;
- every path is emitted twice: the CONCRETE path keeps the leaf symbol
  (VAR(a), NUM(1)); the GENER path erases it to a placeholder (the
  reference's gener-path mechanism, math-index/config.h GENER_PATH_NAME)
  => alpha-equivalence: x+1/x matches a+1/a via gener paths, while
  same-symbol matches additionally hit the concrete paths and rank higher
  (reference test cases/math-rank/alpha-equvalence.txt semantics);
- \\qvar{..} wildcard leaves emit only gener paths (wildcard.txt case).

This is a re-expression, not a port. Scoring: mixed queries default to the
reference MNC bipartite mark-and-cross (search/mnc-score.c twin in
search.py over the ordered leaf-root path table); the containment
similarity over matched path sets is the fallback when no lr table is
available.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

UNORDERED = {"add", "times", "rel", "fun", "sep"}
ORDERED = {"frac", "sup", "sub", "root", "neg", "fact", "binom", "mod", "vect", "mat", "row"}

# VAR-leaf macro vocabulary (lexer.template.l:320-430 — every one lexes to
# a VAR token whose _AUTOGEN_ symbol is the macro name): greek both cases,
# var* variants, and the letterlike/misc symbols of the same block
_GREEK = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "pi rho sigma tau upsilon phi chi psi omega omicron infty "
    "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta Iota Kappa Lambda Mu Nu Xi "
    "Pi Rho Sigma Tau Upsilon Phi Chi Psi Omega Omicron "
    "varepsilon varkappa varphi varpi varrho varsigma vartheta varnothing "
    "varDelta varGamma varLambda varOmega varPhi varPi varPsi varSigma "
    "varTheta varUpsilon varXi "
    "aleph beth eth ell hbar imath jmath mho wr amalg angle backepsilon "
    "empty emptyset partial nabla top triangle triangledown Re Im "
    # VAR-class leaf long tail (lexer DOTS/PERP/angle rules — each lexes to
    # a WC_NORMAL_LEAF with the macro name as symbol); forall/exists are
    # SEP_CLASS operators in the reference (lexer.template.l:487) — leaf
    # treatment here keeps their distinct symbols at the cost of the
    # operator class, which matters less for subpath matching than the
    # symbol identity does
    "cdots ldots vdots ddots iddots dots dotsb dotsc dotsi dotsm dotso "
    "forall exists nexists perp bot measuredangle sphericalangle"
).split()
# function-name classes (lexer.template.l TRIGONOMETRIC/LOG/NAME_FUN/
# MAXMIN/SIGN FUN_CLASS rules): each lexes to one FUN token whose symbol is
# the macro name
_FUNS = (
    "sin cos tan sec csc cot sinh cosh tanh coth arcsin arccos arctan "
    "log ln lg exp lim liminf limsup min max sup inf det gcd deg dim hom "
    "ker arg Pr sgn injlim projlim varinjlim varprojlim varliminf varlimsup "
    "sign signum"
).split()
_BIGOPS = ("sum prod int oint iint iiint iiiint intop smallint idotsint "
           "coprod bigcup bigcap bigvee bigwedge bigoplus bigotimes bigodot "
           "biguplus bigsqcup bigcirc bigtriangleup bigtriangledown").split()
# relation-class macros (lexer GTLS/SUBSET/CAPCUP/INNI REL_CLASS rules +
# the ARROW SEP_CLASS family, folded into the rel chain): the reference
# gives each an _AUTOGEN_ symbol (the macro name); '=' and friends share
# the symbol 'equal' — we keep the historical short names for the core
# comparisons and the macro name for the long tail
_RELS = {"=": "eq", "<": "lt", ">": "gt", "le": "le", "ge": "ge", "leq": "le",
         "geq": "ge", "ne": "neq", "neq": "neq", "approx": "approx", "equiv": "equiv",
         "subset": "subset", "in": "in", "to": "to", "rightarrow": "to"}
_RELS.update(
    {name: name for name in (
        # GTLS comparisons / similarity
        "sim simeq cong propto ll gg leqslant geqslant lesssim gtrsim "
        "prec succ preceq succeq asymp doteq vdash dashv models mid "
        "parallel nparallel neq ne bowtie "
        # set relations (SUBSET / INNI)
        "supset subseteq supseteq subsetneq supsetneq sqsubseteq "
        "sqsupseteq ni notin owns "
        # CAPCUP set operators (REL_CLASS in grammar.y)
        "cap cup uplus sqcap sqcup vee wedge land lor "
        # ARROW family (SEP_CLASS in the reference; folded into the rel
        # chain here — both are unordered classes)
        "gets leftarrow longleftarrow Leftarrow Longleftarrow "
        "longrightarrow Rightarrow Longrightarrow leftrightarrow "
        "Leftrightarrow longleftrightarrow Longleftrightarrow mapsto "
        "longmapsto uparrow downarrow updownarrow nearrow searrow "
        "swarrow nwarrow hookleftarrow hookrightarrow rightharpoonup "
        "rightharpoondown leftharpoonup leftharpoondown implies "
        "impliedby iff rightrightarrows leftleftarrows rightleftarrows "
        # round-5b REL long tail (lexer GTLS/SUBSET/CAPCUP REL_CLASS rules
        # 672-790): AMS comparison/similarity soup and their negations
        "approxeq backsim backsimeq between circeq curlyeqprec curlyeqsucc "
        "eqcirc eqsim eqslantgtr eqslantless geqq ggg gggtr gnapprox gneq "
        "gneqq gnsim gtrapprox gtrdot gtreqless gtreqqless gtrless "
        "gvertneqq leqq lessapprox lessdot lnapprox lneq lneqq lvertneqq "
        "ncong ngeq ngeqq ngeqslant ngtr nleq nleqq nleqslant nless nmid "
        "nprec npreceq nsim nsubseteq nsucc nsucceq nsupseteq precapprox "
        "preccurlyeq precnapprox precneqq precnsim precsim succapprox "
        "succcurlyeq succnapprox succneqq succnsim succsim thickapprox "
        "thicksim triangleq varpropto varsubsetneq varsubsetneqq "
        "varsupsetneq varsupsetneqq vartriangle vartriangleleft "
        "vartriangleright triangleleft triangleright trianglelefteq "
        "trianglerighteq unlhd unrhd sqsubset sqsupset Subset Supset "
        "subseteqq supseteqq subsetneqq supsetneqq Cap Cup curlyvee "
        "curlywedge veebar barwedge Join multimap smallfrown smallsmile frown "
        # round-5b ARROW long tail (SEP_CLASS rules, folded like the rest)
        "circlearrowleft circlearrowright curvearrowleft curvearrowright "
        "downdownarrows downharpoonleft downharpoonright leadsto "
        "leftarrowtail leftrightarrows leftrightharpoons "
        "leftrightsquigarrow looparrowleft looparrowright nLeftarrow "
        "nLeftrightarrow nRightarrow nleftarrow nleftrightarrow "
        "nrightarrow rightarrowtail rightleftharpoons rightsquigarrow "
        "upharpoonleft upharpoonright upuparrows Lleftarrow Rrightarrow "
        "Lsh Rsh Uparrow Downarrow Updownarrow"
    ).split()}
)
_IGNORED_CMDS = {"left", "right", "big", "Big", "bigg", "Bigg", "limits", "nolimits",
                 "quad", "qquad", ",", ";", "!", " ", "mathrm", "mathbf", "mathit",
                 "mathcal", "mathbb", "mathfrak", "mathsf", "boldsymbol", "bm",
                 "displaystyle", "textstyle", "scriptstyle", "thinspace",
                 # font/style tranche (round 5): every one of these hits the
                 # reference lexer's omit-undefined rule (lexer.template.l:880)
                 # so the wrapped symbol parses bare — \mathscr{L} == L
                 "mathscr", "mathtt", "mathds", "mathnormal", "Bbb", "cal",
                 "frak", "scr", "bold", "mathop", "mathbin", "mathrel",
                 "mathord", "mathstrut", "phantom", "vphantom", "hphantom",
                 "scriptscriptstyle", "medspace", "thickspace", "negthinspace",
                 "enspace", "mkern", "mskip", "strut", "smash", "ensuremath"}
# content-IGNORING commands (lexer.template.l:49-53 BEGIN(ign) rules): the
# braced argument is swallowed whole — \text{speed} emits NO tokens.
# The spacing/markup commands with a dimension or label argument
# (\hspace{1em}, \label{eq:1}, \tag{2}, \color{red}; lexer BEGIN(dim) and
# label rules 124-140) get the same treatment: the braced argument
# vanishes. (An unbraced dimension after \kern parses as bare tokens — a
# documented simplification; braced forms dominate real queries.)
_TEXT_CMDS = {"text", "mbox", "hbox", "textrm", "texttt", "textbf", "textit"}
# spacing/markup commands whose braced argument vanishes AT THE TOKEN
# level (lexer BEGIN(dim)/label rules emit no token at all, so a trailing
# \label{..} is not a parse error the way a dangling \text{..} is)
_ARG_SWALLOW_CMDS = {"hspace", "hskip", "mspace", "kern", "label", "tag",
                     "color"}

# infix operator classes from the lexer's ADD/NEG/TIMES/DIV rules
# (lexer.template.l:66-98): each class maps onto the same parse production
# as its ASCII twin (+ - * /); the reference keeps the macro name as the
# token symbol and so do the parse productions below via their node class
_ADD_MACROS = {"\\pm", "\\mp", "\\oplus", "\\dotplus"}
_NEG_MACROS = {"\\ominus", "\\setminus", "\\smallsetminus", "\\backslash"}
_TIMES_MACROS = {"\\cdot", "\\times", "\\ast", "\\circ", "\\otimes",
                 "\\odot", "\\ltimes", "\\rtimes"}
_DIV_MACROS = {"/", "\\div", "\\divideontimes"}

_ACCENTS = "vec hat bar dot ddot tilde overline underline widehat widetilde".split()

# environment classes (lexer.template.l:145-161 vs 839-878): the matrix
# family enters the lexer's <mat> start condition (rows/cols significant);
# the align/equation family's \begin/\end markers VANISH and the body
# parses inline ('&' dropped, '\\' a SEP — lexer rules 881 and 492)
_MAT_ENVS = {"matrix", "vmatrix", "Vmatrix", "bmatrix", "Bmatrix", "pmatrix",
             "smallmatrix", "cases"}
_SKIP_ENVS = {"align", "alignat", "aligned", "alignedat", "array", "eqnarray",
              "equation", "gather", "gathered", "multline", "split", "subarray"}
_ARG_ENVS = {"alignat", "alignedat", "array", "subarray"}  # \begin{..}{arg}
_LEGACY_MAT = {"pmatrix", "bmatrix", "vmatrix", "matrix", "cases", "array",
               "substack"}  # plain-TeX \pmatrix{..} forms (and \array{)

# every macro the parser gives meaning to; anything else that matches
# \\[a-zA-Z]+ is OMITTED at the token level — the reference's
# "omit undefined control sequence" rule (lexer.template.l:880), which is
# what makes \heartsuit x parse as x and font wrappers symbol-preserving
_KNOWN_MACROS = (
    set(_GREEK) | set(_FUNS) | set(_BIGOPS) | set(_RELS) | _IGNORED_CMDS
    | _TEXT_CMDS | set(_ACCENTS) | _LEGACY_MAT
    | {"frac", "sqrt", "qvar", "binom", "begin", "end", "left", "right",
       "over", "atop", "above", "choose", "cdot", "times", "ast", "circ",
       "div", "bmod", "mod", "pmod", "stackrel", "overset", "underset",
       "buildrel", "xleftarrow", "xrightarrow", "operatorname", "labs",
       "rabs", "lfloor", "rfloor", "lceil", "rceil", "cr", "newline",
       "lbrace", "rbrace", "langle", "rangle", "lvert", "rvert", "lVert",
       "rVert", "Vert", "vert", "Vmatrix", "Bmatrix", "smallmatrix",
       "sepnl",
       # round-5b infix classes (ADD/NEG/TIMES/DIV lexer rules 66-98)
       "pm", "mp", "oplus", "dotplus", "ominus", "setminus",
       "smallsetminus", "backslash", "otimes", "odot", "ltimes", "rtimes",
       "divideontimes"}
)

_TOKEN_RE = re.compile(
    r"\\\\|\\[a-zA-Z]+|\\[,;!{}| ]|[0-9]+(?:\.[0-9]+)?|[a-zA-Z]|[+\-*/^_=<>(){}\[\]!|,&']|\S"
)


@dataclass
class Node:
    op: str  # operator token, or "var"/"num"/"qvar" for leaves
    sym: str = ""  # leaf symbol (variable name / number literal)
    children: list["Node"] = field(default_factory=list)

    @property
    def is_leaf(self) -> bool:
        return not self.children


class TexParseError(ValueError):
    pass


MAX_DEPTH = 64  # nesting guard (web input can be adversarial; the
# reference caps decomposition at 64 subpaths anyway)


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0
        self.depth = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise TexParseError("unexpected end of input")
        self.i += 1
        return t

    # rel := expr ((REL | decorated-REL) expr)*
    def parse_rel(self) -> Node:
        left = self.parse_expr()
        rels = []
        while True:
            t = self.peek()
            name = None
            decor = None
            if t in ("=", "<", ">"):
                name = _RELS[t]
                self.next()
            elif t and t.startswith("\\") and t[1:] in _RELS:
                name = _RELS[t[1:]]
                self.next()
            elif t in ("\\xrightarrow", "\\xleftarrow"):
                # X_ARROW (grammar.y): an arrow relation carrying a label
                self.next()
                name = "to"
                if self.peek() == "{":
                    decor = self.parse_base()
            elif t in ("\\stackrel", "\\overset", "\\underset", "\\buildrel"):
                # _STACKREL/_BUILDREL: symbol stacked over a relation; the
                # relation is usually braced ({=}) — unwrap one level
                self.next()
                decor = self.parse_base()
                nt = self.peek()
                if nt == "{" and self.i + 1 < len(self.toks):
                    inner = self.toks[self.i + 1]
                    if inner in _RELS or (inner.startswith("\\") and inner[1:] in _RELS):
                        self.next()
                        nt = self.peek()
                        self._rel_brace = True
                if nt in ("=", "<", ">"):
                    name = _RELS[nt]
                    self.next()
                elif nt and nt.startswith("\\") and nt[1:] in _RELS:
                    name = _RELS[nt[1:]]
                    self.next()
                else:
                    name = "rel"
                if getattr(self, "_rel_brace", False):
                    self._rel_brace = False
                    if self.peek() == "}":
                        self.next()
            if name is None:
                break
            right = self.parse_expr()
            rels.append((name, right, decor))
        if not rels:
            node = left
        else:
            # relation chain: unordered rel node over operands + rel-name
            # leaves (+ decoration subtrees for stackrel / labeled arrows)
            children = [left]
            for name, right, decor in rels:
                children.append(Node("var", sym=f"rel:{name}"))
                if decor is not None:
                    children.append(Node("fun", children=[Node("var", sym="fun:relmark"), decor]))
                children.append(right)
            node = Node("rel", children=children)
        # TeX primitives splitting the enclosing group: {a \over b} == \frac a b,
        # {n \choose k} == \binom n k (grammar.y _OVER / CHOOSE precedence)
        t = self.peek()
        if t in ("\\over", "\\atop"):
            self.next()
            return Node("frac", children=[node, self.parse_rel()])
        if t == "\\above":
            # \above takes a rule-thickness dimension ({a \above 2pt b});
            # the lexer skips it in a dim start condition (lexer.template.l
            # :103-109) — here: one number + its unit letters
            self.next()
            if self.peek() is not None and re.fullmatch(
                r"[0-9]+(?:\.[0-9]+)?", self.peek()
            ):
                self.next()
                two = "".join(self.toks[self.i : self.i + 2])
                if two in ("pt", "em", "ex", "cm", "mm", "in", "bp", "pc", "sp", "mu", "px"):
                    self.i += 2
            return Node("frac", children=[node, self.parse_rel()])
        if t == "\\choose":
            self.next()
            return Node("binom", children=[node, self.parse_rel()])
        return node

    # expr := ['-'] term (('+'|'-') term)*
    def parse_expr(self) -> Node:
        terms = []
        t = self.peek()
        if t == "+" or t == "-" or t in _ADD_MACROS or t in _NEG_MACROS:
            self.next()
            first = self.parse_term()
            neg = t == "-" or t in _NEG_MACROS
            terms.append(Node("neg", children=[first]) if neg else first)
        else:
            terms.append(self.parse_term())
        while (p := self.peek()) is not None and (
            p == "+" or p == "-" or p in _ADD_MACROS or p in _NEG_MACROS
        ):
            opt = self.next()
            nxt = self.parse_term()
            neg = opt == "-" or opt in _NEG_MACROS
            terms.append(Node("neg", children=[nxt]) if neg else nxt)
        if len(terms) == 1:
            return terms[0]
        return Node("add", children=terms)

    # term := factor (('*'|'/'|juxtaposition) factor)*
    def parse_term(self) -> Node:
        factors = [self.parse_factor()]
        while True:
            t = self.peek()
            if t == "*" or t in _TIMES_MACROS:
                self.next()
                factors.append(self.parse_factor())
            elif t in _DIV_MACROS:
                self.next()
                denom = self.parse_factor()
                num = factors.pop() if len(factors) == 1 else Node("times", children=factors)
                factors = [Node("frac", children=[num, denom])]
            elif t in ("\\bmod", "\\mod"):
                self.next()
                rhs = self.parse_factor()
                lhs = factors.pop() if len(factors) == 1 else Node("times", children=factors)
                factors = [Node("mod", children=[lhs, rhs])]
            elif t is not None and self._starts_factor(t):
                factors.append(self.parse_factor())  # juxtaposition => TIMES
            else:
                break
        if len(factors) == 1:
            return factors[0]
        return Node("times", children=factors)

    def _starts_factor(self, t: str) -> bool:
        if t in ("(", "{"):
            return True
        if t in ("[", "|"):
            # '[' starts command options, '|' is open/close-ambiguous: were
            # it a factor-starter, the CLOSING bar of |x| would open a new
            # absolute value and swallow the rest of the input
            return False
        if re.fullmatch(r"[0-9]+(?:\.[0-9]+)?|[a-zA-Z]", t):
            return True
        if t.startswith("\\"):
            name = t[1:]
            return (
                name in _GREEK
                or name in _FUNS
                or name in _BIGOPS
                or name in _ACCENTS
                or name in ("frac", "sqrt", "qvar", "binom", "begin")
                # '\labs' (preprocessed \left|) is unambiguous — always an
                # opener — so 2\left|x\right| parses as juxtaposition
                # (multiplication), unlike bare '|' which stays excluded
                or name in ("labs", "lfloor", "lceil")
                or name in ("operatorname", "substack")
                or name in _TEXT_CMDS
                or name in _IGNORED_CMDS
            )
        return False

    # factor := base (('^'|'_') base | '!' | prime)*
    def parse_factor(self) -> Node:
        base = self.parse_base()
        while self.peek() in ("^", "_", "!", "'"):
            t = self.next()
            if t == "!":
                base = Node("fact", children=[base])
                continue
            if t == "'":
                # PRIME token class: x' models as x^prime
                base = Node("sup", children=[base, Node("var", sym="prime")])
                continue
            script = self.parse_base()
            base = Node("sup" if t == "^" else "sub", children=[base, script])
        return base

    def parse_base(self) -> Node:
        self.depth += 1
        if self.depth > MAX_DEPTH:
            raise TexParseError("nesting too deep")
        try:
            return self._parse_base_inner()
        finally:
            self.depth -= 1

    def _parse_base_inner(self) -> Node:
        t = self.next()
        if t == "(":
            items = [self.parse_rel()]
            while self.peek() == ",":
                # tuple/set comma list inside a bracket class -> SEP group
                self.next()
                items.append(self.parse_rel())
            if self.peek() == ")":
                self.next()
            return items[0] if len(items) == 1 else Node("sep", children=items)
        if t == "{":
            inner = self.parse_rel()
            if self.peek() == "}":
                self.next()
            return inner
        if t == "|":
            inner = self.parse_rel()
            if self.peek() == "|":
                self.next()
            return Node("fun", children=[Node("var", sym="fun:abs"), inner])
        if re.fullmatch(r"[0-9]+(?:\.[0-9]+)?", t):
            return Node("num", sym=t)
        if re.fullmatch(r"[a-zA-Z]", t):
            return Node("var", sym=t)
        if t.startswith("\\"):
            name = t[1:]
            if name in _IGNORED_CMDS:
                return self.parse_base()
            if name in _TEXT_CMDS:
                # content IGNORED whole (lexer ign start condition): emits
                # no tokens, so the value is whatever follows; a dangling
                # \text{..} leaves the grammar with nothing to reduce —
                # a parse error, exactly like the reference's bison run
                self._consume_brace_group()
                return self.parse_base()
            if name == "operatorname":
                # \operatorname{..} lexes to ONE generic usr_fun FUN token
                # (lexer.template.l:615) — the braced name is NOT a symbol
                if self.peek() == "*":
                    self.next()
                self._consume_brace_group()
                return self._fun_node("usr_fun")
            if name == "substack":
                # multi-line script stack: rows separated by \\ inside one
                # brace group -> SEP group (beyond the reference grammar,
                # which errors on \substack; kept lenient and documented)
                if self.peek() != "{":
                    return Node("var", sym=name)
                self.next()
                rows = [self.parse_rel()]
                while self.peek() == "\\\\":
                    self.next()
                    rows.append(self.parse_rel())
                if self.peek() == "}":
                    self.next()
                return rows[0] if len(rows) == 1 else Node("sep", children=rows)
            if name in ("pmatrix", "bmatrix", "vmatrix", "matrix", "cases", "array") and self.peek() == "{":
                # plain-TeX legacy matrix form: \pmatrix{a & b \cr c & d}
                return self._parse_matrix_body(close_brace=True)
            if name == "labs":  # \left| ... \right|  (preprocessed)
                inner = self.parse_rel()
                if self.peek() == "\\rabs":
                    self.next()
                return Node("fun", children=[Node("var", sym="fun:abs"), inner])
            if name == "rabs":
                # dangling \right| = evaluation bar; scripts attach normally
                return Node("var", sym="evalbar")
            if name in ("lfloor", "lceil"):
                # \lfloor x \rfloor -> floor(x) (bracket class with an
                # operator meaning, like the reference's floor/ceil tokens)
                fn = "floor" if name == "lfloor" else "ceil"
                inner = self.parse_rel()
                if self.peek() in ("\\rfloor", "\\rceil"):
                    self.next()
                return Node("fun", children=[Node("var", sym=f"fun:{fn}"), inner])
            if name in ("rfloor", "rceil"):
                return Node("var", sym=name)
            if name in _GREEK:
                return Node("var", sym=name)
            if name == "qvar":
                if self.peek() == "{":
                    self.next()
                    depth = 1
                    while depth and self.peek() is not None:
                        nt = self.next()
                        depth += nt == "{"
                        depth -= nt == "}"
                return Node("qvar", sym="*")
            if name == "frac":
                a = self.parse_base()
                b = self.parse_base()
                return Node("frac", children=[a, b])
            if name == "binom":
                a = self.parse_base()
                b = self.parse_base()
                return Node("binom", children=[a, b])
            if name in _ACCENTS:
                # VECT class: accent name travels as an ordered head leaf so
                # \vec{x} != \hat{x} but both alpha-match via gener paths
                return Node("vect", children=[Node("var", sym=f"acc:{name}"), self.parse_base()])
            if name == "pmod":
                return Node("fun", children=[Node("var", sym="fun:pmod"), self.parse_base()])
            if name == "begin":
                return self._parse_matrix()
            if name == "sqrt":
                if self.peek() == "[":
                    self.next()
                    order = self.parse_rel()
                    if self.peek() == "]":
                        self.next()
                    body = self.parse_base()
                    return Node("root", children=[order, body])
                return Node("root", children=[Node("num", sym="2"), self.parse_base()])
            if name in _FUNS or name in _BIGOPS:
                return self._fun_node(name)
            # unknown command: treat as an opaque symbol leaf
            return Node("var", sym=name)
        if t == ",":
            return Node("var", sym="sep:comma")
        raise TexParseError(f"unexpected token {t!r}")

    def _fun_node(self, name: str) -> Node:
        """FUN/SUM-class head: scripts attach to the head, a following
        factor becomes the argument (grammar.y FUN_CLASS/SUM_CLASS rules)."""
        head = Node("var", sym=f"fun:{name}")
        node = Node("fun", children=[head])
        while self.peek() in ("^", "_"):
            s = self.next()
            script = self.parse_base()
            node = Node("sup" if s == "^" else "sub", children=[node, script])
        if self.peek() is not None and self._starts_factor(self.peek()):
            node = Node("fun", children=[node, self.parse_factor()])
        return node

    def _consume_brace_group(self) -> str:
        """Read a { ... } group as a raw string (env names, col specs)."""
        if self.peek() != "{":
            return ""
        self.next()
        parts = []
        depth = 1
        while depth and self.peek() is not None:
            t = self.next()
            depth += t == "{"
            depth -= t == "}"
            if depth:
                parts.append(t)
        return "".join(parts)

    def _parse_matrix(self) -> Node:
        """\\begin{matrix} a & b \\\\ c & d \\end{matrix} and friends
        (pmatrix/bmatrix/vmatrix/cases/array; grammar.y TAB_ROW/TAB_COL,
        _BEGIN_MAT/_END_MAT). Rows and cells are ORDER-significant."""
        env = self._consume_brace_group()
        if env == "array" and self.peek() == "{":
            self._consume_brace_group()  # column spec, layout-only
        return self._parse_matrix_body(close_brace=False, env=env)

    def _parse_matrix_body(self, close_brace: bool, env: str = "matrix") -> Node:
        """Rows/cells until \\end{..} (environment form) or the matching
        '}' (plain-TeX legacy \\pmatrix{a & b \\cr c & d} form, where \\cr
        is the TAB_ROW token like \\\\)."""
        if close_brace:
            self.next()  # consume the opening '{'
        rows: list[Node] = []
        cells: list[Node] = []
        while True:
            t = self.peek()
            if t is None:
                break
            if close_brace and t == "}":
                self.next()
                break
            if not close_brace and t == "\\end":
                self.next()
                self._consume_brace_group()
                break
            if t == "&":
                self.next()
                continue
            if t in ("\\\\", "\\cr"):
                self.next()
                if cells:
                    rows.append(Node("row", children=cells))
                    cells = []
                continue
            cells.append(self.parse_rel())
        if cells:
            rows.append(Node("row", children=cells))
        if not rows:
            raise TexParseError(f"empty {env or 'matrix'} environment")
        return Node("mat", children=rows)


def _preprocess(toks: list[str]) -> list[str]:
    """Resolve \\left/\\right pairs at the token level (grammar.y's
    _L_*/_R_* bracket tokens): invisible '.' delimiters vanish, '|'
    delimiters become distinct abs-open/abs-close markers (so
    \\left| x \\right| is abs and a dangling \\right| is an evaluation
    bar), any other delimiter keeps its normal meaning."""
    # bracket-class aliases (grammar.y's _L_*/_R_* token classes): set
    # braces and angle brackets group like parentheses; \lvert/\lVert
    # families are abs/norm-class (both map onto the abs markers)
    alias = {
        "\\{": "(", "\\}": ")", "\\lbrace": "(", "\\rbrace": ")",
        "\\langle": "(", "\\rangle": ")",
        "\\lvert": "\\labs", "\\rvert": "\\rabs",
        "\\lVert": "\\labs", "\\rVert": "\\rabs", "\\Vert": "|", "\\vert": "|",
        # round-5b variant folding: display/continued-fraction variants are
        # the same FRAC/CHOOSE tokens in the lexer (lexer.template.l:114-122);
        # \lbrack/\rbrack and \lgroup/\rgroup are plain bracket tokens
        # (rules 249-252); \overrightarrow/\overleftarrow lex to the same
        # VECT class as \vec (rules 214-217)
        "\\cfrac": "\\frac", "\\dfrac": "\\frac", "\\tfrac": "\\frac",
        "\\dbinom": "\\binom", "\\tbinom": "\\binom",
        "\\lbrack": "(", "\\rbrack": ")", "\\lgroup": "(", "\\rgroup": ")",
        "\\overrightarrow": "\\vec", "\\overleftarrow": "\\vec",
    }
    toks = [alias.get(t, t) for t in toks]
    out: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t in ("\\left", "\\right"):
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            if nxt == ".":
                i += 2
                continue
            if nxt in ("|", "\\|"):
                out.append("\\labs" if t == "\\left" else "\\rabs")
                i += 2
                continue
            i += 1
            continue
        out.append(t)
        i += 1
    return _strip_envs_and_unknown(out)


def _strip_envs_and_unknown(toks: list[str]) -> list[str]:
    r"""flex-parity environment + vocabulary pass (lexer.template.l):

    - \begin/\end markers of the align/equation family VANISH (their body
      parses inline; alignat/array-style column args are swallowed whole,
      rules 839-878);
    - '&' is DROPPED outside matrix scope (rule 881), where matrix scope is
      env-form \begin{matrix-family}..\end{..} nesting or a legacy
      \pmatrix{..} brace group (the lexer's mat_stack);
    - '\\\\' / \newline outside matrix scope becomes the private
      \sepnl marker (SEP-class separator, rule 492) — inside matrix scope
      it stays the row break;
    - any OTHER \\[a-zA-Z]+ macro the grammar gives no meaning is omitted
      (rule 880) so its braced argument parses as a normal group —
      \mathscr{L} == L, \heartsuit x == x.
    """
    out: list[str] = []
    i, n = 0, len(toks)
    mat_env = 0
    legacy_at: list[int] = []  # brace depths where a legacy \pmatrix{ opened
    brace = 0

    def group(j: int) -> tuple[str, int]:
        # toks[j] == "{": (joined content, index past the matching "}")
        depth, j = 1, j + 1
        parts = []
        while j < n and depth:
            tk = toks[j]
            depth += tk == "{"
            depth -= tk == "}"
            if depth:
                parts.append(tk)
            j += 1
        return "".join(parts), j

    while i < n:
        t = toks[i]
        in_mat = mat_env > 0 or bool(legacy_at)
        if t in ("\\begin", "\\end") and i + 1 < n and toks[i + 1] == "{":
            env, j = group(i + 1)
            base = env.rstrip("*")
            if base in _SKIP_ENVS:
                i = j
                if t == "\\begin" and base in _ARG_ENVS and i < n and toks[i] == "{":
                    _, i = group(i)
                continue
            if base in _MAT_ENVS:
                mat_env = max(mat_env + (1 if t == "\\begin" else -1), 0)
            out.append(t)
            i += 1
            continue
        if (
            t.startswith("\\")
            and t[1:] in _LEGACY_MAT
            and i + 1 < n
            and toks[i + 1] == "{"
        ):
            legacy_at.append(brace)
            out.append(t)
            i += 1
            continue
        if t == "{":
            brace += 1
        elif t == "}":
            brace -= 1
            if legacy_at and brace <= legacy_at[-1]:
                legacy_at.pop()
        elif t == "&" and not in_mat:
            i += 1
            continue
        elif t in ("\\\\", "\\newline") and not in_mat:
            out.append("\\sepnl")
            i += 1
            continue
        elif t.startswith("\\") and t[1:] in _ARG_SWALLOW_CMDS:
            # \hspace{1em} / \label{eq:1} / \tag{2} / \color{red}: the
            # lexer's BEGIN(dim)/label rules emit NO token for the macro or
            # its argument — swallow both here so a trailing \label never
            # reaches the grammar (unbraced \kern 1em keeps its bare
            # dimension tokens; braced forms dominate real queries)
            i += 1
            if i < n and toks[i] == "{":
                _, i = group(i)
            continue
        elif (
            re.fullmatch(r"\\[a-zA-Z]+", t)
            and t[1:] not in _KNOWN_MACROS
        ):
            i += 1  # omit undefined control sequence (lexer.template.l:880)
            continue
        out.append(t)
        i += 1
    return out


def tex_parse(tex: str) -> Node:
    """Parse a TeX snippet into an operator tree. Raises TexParseError."""
    toks = _preprocess([t for t in _TOKEN_RE.findall(tex) if t.strip()])
    if not toks:
        raise TexParseError("empty expression")
    p = _Parser(toks)
    node = p.parse_rel()
    while p.peek() is not None:
        if p.peek() == "\\sepnl":
            # newline separator outside matrix scope (reference SEP token,
            # lexer.template.l:492): the fold below IS the sep grouping
            p.next()
            if p.peek() is None:
                break
            continue
        # trailing content (e.g. comma lists): fold into a SEP group
        rest = p.parse_rel()
        node = Node("sep", children=[node, rest])
    return node


MAX_SUBPATHS = 64  # reference cap (tex-parser decompose limit, SURVEY §2 I6)


def subpaths(node: Node) -> list[tuple[str, bool]]:
    """Operator tree -> leaf-root subpaths [(path, is_gener)].

    Concrete path example for a+1/a:  'VAR(a)/add', 'NUM(1)/frac#1/add',
    'VAR(a)/frac#2/add'; gener twin erases the leaf: 'V/add', ...
    """
    out: list[tuple[str, bool]] = []

    def walk(n: Node, trail: list[str]) -> None:
        if len(out) >= 2 * MAX_SUBPATHS:
            return
        if n.is_leaf:
            up = "/".join(reversed(trail)) if trail else ""
            suffix = ("/" + up) if up else ""
            if n.op == "qvar":
                out.append(("V" + suffix, True))
            elif n.op == "num":
                out.append((f"NUM({n.sym})" + suffix, False))
                out.append(("N" + suffix, True))
            else:
                out.append((f"VAR({n.sym})" + suffix, False))
                out.append(("V" + suffix, True))
            return
        for rank, child in enumerate(n.children, start=1):
            tag = f"{n.op}#{rank}" if n.op in ORDERED else n.op
            walk(child, [*trail, tag])

    walk(node, [])
    # dedup (subpath-set semantics: a SET of paths, subpath-set.c:25-37)
    return sorted(set(out))


def lr_paths(node: Node) -> list[tuple[str, str]]:
    """Operator tree -> ORDERED leaf-root paths [(struct, symbol)].

    Unlike ``subpaths`` (a dedup'd set for indexing), this keeps one entry
    per LEAF in leaf order — the reference's subpath list whose positions
    become MNC path_ids (math-expr-search.c:69-78 assign_path_id_in_order).
    ``struct`` is the gener-form path (leaf-kind marker V/N + operator
    trail); ``symbol`` is the concrete leaf symbol, '*' for \\qvar
    wildcards (a symbol that matches nothing exactly, so wildcards earn
    the normal MNC_MARK_SCORE but never the exact-match bonus).
    """
    out: list[tuple[str, str]] = []

    def walk(n: Node, trail: list[str]) -> None:
        if len(out) >= MAX_SUBPATHS:
            return
        if n.is_leaf:
            up = "/".join(reversed(trail))
            suffix = ("/" + up) if up else ""
            if n.op == "qvar":
                out.append(("V" + suffix, "*"))
            elif n.op == "num":
                out.append(("N" + suffix, n.sym))
            else:
                out.append(("V" + suffix, n.sym))
            return
        for rank, child in enumerate(n.children, start=1):
            tag = f"{n.op}#{rank}" if n.op in ORDERED else n.op
            walk(child, [*trail, tag])

    walk(node, [])
    return out


def tex_lr_paths(tex: str) -> list[tuple[str, str]]:
    """Parse + ordered decomposition; [] on parse failure."""
    try:
        return lr_paths(tex_parse(tex))
    except TexParseError:
        return []


def tex_subpaths(tex: str) -> list[tuple[str, bool]]:
    """Parse + decompose; returns [] on parse failure (the reference counts
    parse errors and skips the expression, indexer/index.c:82-94)."""
    try:
        return subpaths(tex_parse(tex))
    except TexParseError:
        return []

"""Per-class parse coverage of the reference grammar's token classes.

Enumerates the token classes of tex-parser/grammar.y:35-97 with one or
more representative inputs each; every input must parse and decompose to a
non-empty subpath set (the reference's parse-or-n_parse_err gate).
Class-specific semantics (content-ignoring \\text, the generic
\\operatorname symbol, legacy \\pmatrix rows) are pinned where the lexer
defines them (lexer.template.l:49-53, :615, :150).
"""

from __future__ import annotations

import pytest

from search_engine_spark.math.texparse import tex_lr_paths, tex_parse, tex_subpaths

# grammar.y token class -> representative TeX inputs
GRAMMAR_CLASSES = {
    "NUM": ["42", "3.14"],
    "VAR": ["x", "X \\alpha \\infty"],
    "ADD": ["a + b"],
    "NEG": ["a - b", "-a"],
    "TIMES": ["a b", "a \\cdot b", "a \\times b", "2x"],
    "DIV": ["a / b", "a \\div b"],
    "FRAC": ["\\frac{a}{b}", "{a \\over b}"],
    "ABOVE": ["{a \\above 2pt b}", "{a \\above 1.5pt b + c}"],
    "SUM_CLASS": ["\\sum_{i=1}^{n} i", "\\int_0^1 x", "\\prod_k k",
                  "\\bigcup_i A_i", "\\lim_{x \\to 0} x"],
    "SEP_CLASS": ["(a, b)", "a \\atop b", "\\substack{a \\\\ b}"],
    "REL_CLASS": ["a = b", "a < b", "a \\le b", "a \\sim b", "a \\cong b",
                  "a \\ll b", "a \\prec b", "a \\subseteq b", "a \\cap b",
                  "a \\cup b", "a \\in A", "a \\notin A", "a \\mid b",
                  "a \\parallel b", "a \\propto b"],
    "ARROW(SEP_CLASS)": ["a \\to b", "a \\mapsto b", "a \\Rightarrow b",
                         "a \\leftrightarrow b", "a \\hookrightarrow b",
                         "a \\implies b", "a \\iff b", "a \\uparrow b"],
    "FUN_CLASS": ["\\sin x", "\\cos^2 x", "\\log_2 n", "\\det A", "\\gcd(a,b)",
                  "\\Pr(X)", "\\dim V", "\\ker f", "\\sinh x", "\\arctan x",
                  "\\liminf_n a_n"],
    "USR_FUN(FUN_CLASS)": ["\\operatorname{lcm}(a,b)", "\\operatorname*{argmax}_x f"],
    "PRIME": ["f'", "x''"],
    "SUBSCRIPT": ["x_i"],
    "SUPSCRIPT": ["x^2"],
    "BINOM": ["\\binom{n}{k}", "{n \\choose k}"],
    "SQRT/ROOT": ["\\sqrt{x}", "\\sqrt[3]{x}"],
    "VECT": ["\\vec{v}", "\\hat{x}", "\\bar{y}", "\\overline{z}"],
    "MODULAR": ["a \\bmod n", "a \\pmod n"],
    "FACT": ["n!"],
    "_QVAR": ["\\qvar{x} + 1"],
    "TAB/MATRIX": ["\\begin{matrix} a & b \\\\ c & d \\end{matrix}",
                   "\\begin{pmatrix} 1 & 0 \\\\ 0 & 1 \\end{pmatrix}",
                   "\\begin{cases} x & x > 0 \\\\ 0 & x \\le 0 \\end{cases}",
                   "\\pmatrix{a & b \\cr c & d}"],
    "STACKREL/SET_REL": ["a \\stackrel{d}{=} b", "a \\overset{d}{=} b",
                         "a \\underset{n}{=} b"],
    "X_ARROW": ["a \\xrightarrow{f} b"],
    "BRACKETS(_L_*/_R_*)": ["(a + b)", "\\{a, b\\}", "\\langle a, b \\rangle",
                            "\\lvert x \\rvert", "\\lfloor x \\rfloor",
                            "\\left( a \\right)", "\\left| x \\right|",
                            "\\left. a \\right|_0^1"],
    "IGN(text)": ["\\text{speed } v", "\\mbox{if } x > 0"],
}


@pytest.mark.parametrize(
    "cls,examples", GRAMMAR_CLASSES.items(), ids=list(GRAMMAR_CLASSES)
)
def test_class_parses_and_decomposes(cls, examples):
    for ex in examples:
        paths = tex_subpaths(ex)
        assert paths, f"{cls}: {ex!r} failed to parse/decompose"


def test_text_content_is_ignored():
    # lexer.template.l:49-53 — the braced argument emits NO tokens
    assert tex_subpaths("\\text{abcdef} x") == tex_subpaths("x")
    assert tex_subpaths("\\mbox{hello world} \\frac{a}{b}") == tex_subpaths("\\frac{a}{b}")


def test_operatorname_is_one_generic_symbol():
    # lexer.template.l:615 — \operatorname{..} lexes to ONE usr_fun token;
    # different names are the SAME symbol
    assert tex_subpaths("\\operatorname{lcm}(a,b)") == tex_subpaths("\\operatorname{foo}(a,b)")


def test_legacy_pmatrix_equals_environment_form():
    legacy = tex_subpaths("\\pmatrix{a & b \\cr c & d}")
    env = tex_subpaths("\\begin{pmatrix} a & b \\\\ c & d \\end{pmatrix}")
    assert legacy == env


def test_underset_matches_overset_shape():
    assert tex_subpaths("a \\underset{n}{=} b") == tex_subpaths("a \\overset{n}{=} b")


def test_above_is_a_fraction():
    assert tex_subpaths("{a \\above 2pt b}") == tex_subpaths("\\frac{a}{b}")


def test_arrow_and_rel_long_tail_have_distinct_symbols():
    # autogen symbols: each macro name is its own leaf symbol
    assert tex_subpaths("a \\mapsto b") != tex_subpaths("a \\hookrightarrow b")
    assert tex_subpaths("a \\sim b") != tex_subpaths("a \\cong b")


def test_unknown_macro_omitted_like_reference():
    # \\[a-zA-Z]+ with no grammar meaning is OMITTED at the token level
    # (lexer.template.l:880 "omit undefined control sequence"), so the
    # rest of the expression parses as if the macro were absent
    assert tex_subpaths("\\notarealmacro + x") == tex_subpaths("+ x")
    assert tex_subpaths("\\heartsuit x") == tex_subpaths("x")


def test_font_wrappers_are_symbol_preserving():
    # font/style macros hit the same omit rule: the wrapped symbol parses
    # bare, so \mathbb{R} == R (and styled twins are alpha-equal exactly)
    assert tex_subpaths("\\mathbb{R}") == tex_subpaths("R")
    assert tex_subpaths("\\mathcal{L} + 1") == tex_subpaths("L + 1")
    assert tex_subpaths("\\boldsymbol{\\mu}") == tex_subpaths("\\mu")
    assert tex_subpaths("\\mathrm{d}x") == tex_subpaths("dx")


def test_align_family_envs_parse_inline():
    # \begin/\end markers of the align/equation family vanish
    # (lexer.template.l:839-878); '&' drops outside matrix scope (rule 881)
    # and '\\\\' is a SEP separator (rule 492)
    assert tex_subpaths("\\begin{align} x &= y \\\\ z &= w \\end{align}") == tex_subpaths(
        "x = y \\\\ z = w"
    )
    assert tex_subpaths("\\begin{equation} E=mc^2 \\end{equation}") == tex_subpaths("E=mc^2")
    assert tex_subpaths("\\begin{split} a &+ b \\end{split}") == tex_subpaths("a + b")
    # array env markers skip too (the reference treats only the matrix
    # family as <mat>; \begin{array}{cc} swallows its column spec)
    assert tex_subpaths("\\begin{array}{cc} a & b \\end{array}") == tex_subpaths("a b")


def test_matrix_envs_keep_tab_semantics():
    # the matrix family still enters row/col-significant parsing, '&' alive
    m1 = tex_subpaths("\\begin{pmatrix} a & b \\\\ c & d \\end{pmatrix}")
    m2 = tex_subpaths("\\begin{pmatrix} b & a \\\\ c & d \\end{pmatrix}")
    assert m1 and m1 != m2
    # Bmatrix/Vmatrix variants share the class
    assert tex_subpaths("\\begin{Bmatrix} a \\end{Bmatrix}")


def test_capital_greek_and_letterlike_are_var_leaves():
    # lexer.template.l:320-430 VAR-leaf vocabulary: capital greek, var*
    # variants, letterlike symbols — each a leaf with its macro-name symbol
    got = {sym for _, sym in tex_lr_paths("\\Gamma + \\varphi + \\aleph + \\partial")}
    assert got >= {"Gamma", "varphi", "aleph", "partial"}


def test_round5b_infix_operator_classes():
    # lexer.template.l:66-98 ADD/NEG/TIMES/DIV rules: each macro maps onto
    # the same parse production as its ASCII twin
    assert tex_subpaths("a \\pm b") == tex_subpaths("a + b")
    assert tex_subpaths("a \\oplus b") == tex_subpaths("a + b")
    assert tex_subpaths("x \\setminus y") == tex_subpaths("x - y")
    assert tex_subpaths("x \\ominus y") == tex_subpaths("x - y")
    assert tex_subpaths("A \\otimes B") == tex_subpaths("A \\times B")
    assert tex_subpaths("A \\odot B") == tex_subpaths("A \\cdot B")
    assert tex_subpaths("p \\divideontimes q") == tex_subpaths("p / q")


def test_round5b_fraction_and_binom_variants_fold():
    # display/continued variants are the same FRAC/CHOOSE token
    # (lexer.template.l:114-122)
    assert tex_subpaths("\\cfrac{a}{b}") == tex_subpaths("\\frac{a}{b}")
    assert tex_subpaths("\\dfrac{a}{b}") == tex_subpaths("\\frac{a}{b}")
    assert tex_subpaths("\\tfrac{a}{b}") == tex_subpaths("\\frac{a}{b}")
    assert tex_subpaths("\\dbinom{n}{k}") == tex_subpaths("\\binom{n}{k}")
    assert tex_subpaths("\\tbinom{n}{k}") == tex_subpaths("\\binom{n}{k}")


def test_round5b_rel_long_tail_and_leaves():
    # AMS relation soup lexes to the REL class (rules 672-790); dots /
    # quantifier / perp macros are VAR leaves with their macro-name symbol
    assert tex_subpaths("x \\approxeq y")  # parses, non-empty
    assert tex_subpaths("x \\nleq y")
    assert tex_subpaths("a \\triangleq b")
    got = {sym for _, sym in tex_lr_paths("\\forall x , \\exists y , \\cdots , u \\perp v")}
    assert got >= {"forall", "exists", "cdots"}


def test_round5b_bracket_group_and_vect_aliases():
    # \lbrack..\rbrack groups like a bracket pair (lexer rules 249-252);
    # \overrightarrow is the \vec VECT class (rules 214-217)
    assert tex_subpaths("\\lbrack x + y \\rbrack") == tex_subpaths("(x + y)")
    assert tex_subpaths("\\overrightarrow{AB}") == tex_subpaths("\\vec{AB}")


def test_round5b_dimension_and_label_args_vanish():
    # \hspace{1em} / \label{eq:1} / \tag{2} / \color{red} swallow their
    # braced argument (lexer BEGIN(dim)/label rules)
    assert tex_subpaths("x \\hspace{1em} y") == tex_subpaths("x y")
    assert tex_subpaths("E = mc^2 \\label{eq:emc}") == tex_subpaths("E = mc^2")
    assert tex_subpaths("x \\color{red} + y") == tex_subpaths("x + y")


def test_round5b_lim_variants_are_funs():
    # same STRUCTURE as \injlim (a fun leaf applied to f); concrete paths
    # differ only in the leaf symbol (fun:varinjlim vs fun:injlim)
    assert [p for p, g in tex_subpaths("\\varinjlim f") if g] == [
        p for p, g in tex_subpaths("\\injlim f") if g
    ]
    got = {sym for _, sym in tex_lr_paths("\\varinjlim f")}
    assert "fun:varinjlim" in got

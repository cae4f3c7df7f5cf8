"""Jinja-subset engine parity vs the real jinja2 HF chat-template environment.

Oracle: transformers' `_compile_jinja_template` (the exact environment HF
`apply_chat_template` uses: trim_blocks, lstrip_blocks, loopcontrols,
tojson(ensure_ascii=False)). Inputs: the reference repo's real model
templates (reference: models/templates/*.jinja) — used as test *data*, not
code. Every template x conversation where the oracle renders successfully
must match byte-for-byte.
"""

import datetime
import glob
import os

import pytest

from sparkinfer_tpu.common.jinja import Template, TemplateError, render

TEMPLATE_DIR = "/root/reference/models/templates"

FIXED_NOW = datetime.datetime(2026, 3, 14, 9, 26, 53)


class _FixedDatetime(datetime.datetime):
    @classmethod
    def now(cls, tz=None):
        return FIXED_NOW


@pytest.fixture()
def oracle(monkeypatch):
    jinja2 = pytest.importorskip("jinja2")
    import transformers.utils.chat_template_utils as ctu

    monkeypatch.setattr(ctu, "datetime", _FixedDatetime)

    def run(src, variables):
        tmpl = ctu._compile_jinja_template(src)
        return tmpl.render(**variables)

    return run


SIMPLE = [
    {"role": "system", "content": "You are concise."},
    {"role": "user", "content": "What is 2+2?"},
]
MULTI = [
    {"role": "system", "content": "Be helpful & honest. <tags> stay raw."},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "Hello! How can I help?"},
    {"role": "user", "content": "Tell me a joke about 'quotes'."},
]
NO_SYSTEM = [{"role": "user", "content": "just one user turn"}]

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "description": "Get current weather",
            "parameters": {
                "type": "object",
                "properties": {
                    "city": {"type": "string", "description": "City name"},
                    "unit": {"type": "string", "enum": ["C", "F"]},
                },
                "required": ["city"],
            },
        },
    }
]
TOOL_CONV = [
    {"role": "system", "content": "You may call tools."},
    {"role": "user", "content": "Weather in Paris?"},
    {
        "role": "assistant",
        "content": "",
        "tool_calls": [
            {
                "id": "call_00001",
                "type": "function",
                "function": {"name": "get_weather", "arguments": {"city": "Paris"}},
            }
        ],
    },
    {"role": "tool", "name": "get_weather", "tool_call_id": "call_00001", "content": "18C, sunny"},
    {"role": "user", "content": "and in celsius?"},
]

# string-arguments variant (some templates tojson dicts, others expect the
# OpenAI string form) and a reasoning turn (deepseek/minimax-style models)
TOOL_CONV_STRARGS = [
    {"role": "user", "content": "Weather in Paris?"},
    {
        "role": "assistant",
        "content": None,
        "tool_calls": [
            {
                "id": "call_00002",
                "type": "function",
                "function": {"name": "get_weather",
                             "arguments": "{\"city\": \"Paris\"}"},
            }
        ],
    },
    {"role": "tool", "name": "get_weather", "tool_call_id": "call_00002",
     "content": "18C"},
]
REASONING = [
    {"role": "user", "content": "why is the sky blue?"},
    {"role": "assistant", "content": "Rayleigh scattering.",
     "reasoning_content": "shorter wavelengths scatter more"},
    {"role": "user", "content": "thanks"},
]

CONVS = {
    "simple": (SIMPLE, None),
    "multi": (MULTI, None),
    "no_system": (NO_SYSTEM, None),
    "tools": (SIMPLE, TOOLS),
    "tool_loop": (TOOL_CONV, TOOLS),
    "tool_strargs": (TOOL_CONV_STRARGS, TOOLS),
    "reasoning": (REASONING, None),
}


def _variables(messages, tools):
    return {
        "messages": messages,
        "tools": tools,
        "add_generation_prompt": True,
        "bos_token": "<s>",
        "eos_token": "</s>",
    }


def _corpus():
    return sorted(glob.glob(os.path.join(TEMPLATE_DIR, "*.jinja")))


@pytest.mark.skipif(not os.path.isdir(TEMPLATE_DIR), reason="reference corpus absent")
def test_corpus_parity(oracle):
    """Byte parity on every (template, conversation) the oracle can render."""
    matched, mismatches, ours_failed = 0, [], []
    matched_templates = set()
    for path in _corpus():
        with open(path) as f:
            src = f.read()
        for cname, (messages, tools) in CONVS.items():
            variables = _variables(messages, tools)
            try:
                want = oracle(src, variables)
            except Exception:
                continue  # template rejects this conversation shape
            try:
                got = render(src, variables, now=FIXED_NOW)
            except TemplateError as e:
                ours_failed.append((os.path.basename(path), cname, str(e)))
                continue
            if got == want:
                matched += 1
                matched_templates.add(os.path.basename(path))
            else:
                k = next(
                    (i for i, (a, b) in enumerate(zip(got, want)) if a != b),
                    min(len(got), len(want)),
                )
                mismatches.append(
                    (os.path.basename(path), cname,
                     f"...{want[max(0, k - 40):k + 40]!r} != ...{got[max(0, k - 40):k + 40]!r}")
                )
    assert not mismatches, mismatches
    assert not ours_failed, ours_failed
    # the corpus has ~40 templates; require broad coverage, not cherry-picks
    assert len(matched_templates) >= 25, sorted(matched_templates)
    assert matched >= 80, matched


def test_whitespace_control(oracle):
    src = "a\n  {%- if x %} b {% endif -%}\n c\n{% if x %}\nd\n{% endif %}"
    v = {"x": True}
    assert render(src, v) == oracle(src, v)
    v = {"x": False}
    assert render(src, v) == oracle(src, v)


def test_expressions(oracle):
    cases = [
        ("{{ 1 + 2 * 3 }}", {}),
        ("{{ 'a' ~ 1 ~ none }}", {}),
        ("{{ (1, 2) | list }}", {}),
        ("{{ [3, 1, 2] | sort | join(',') }}", {}),
        ("{{ {'b': 1, 'a': 2} | dictsort | list }}", {}),
        ("{{ x.y | default('dflt') }}", {"x": {}}),
        ("{{ 'abc'.upper() }}{{ ' x '.strip() }}", {}),
        ("{{ msgs | selectattr('role', 'equalto', 'user') | list | length }}",
         {"msgs": SIMPLE}),
        ("{{ msgs | rejectattr('role', 'equalto', 'user') | map(attribute='role') | join('+') }}",
         {"msgs": MULTI}),
        ("{{ 5 if cond else 7 }}", {"cond": False}),
        ("{{ a is defined }}/{{ b is defined }}/{{ a is not none }}", {"a": 1}),
        ("{{ 'x' in d }}{{ 'q' not in d }}", {"d": {"x": 1}}),
        ("{{ s[1:3] }}{{ s[-1] }}{{ lst[1:] | join('') }}",
         {"s": "hello", "lst": ["a", "b", "c"]}),
        ("{{ v | tojson }}", {"v": {"k": "va'l<ue>", "n": [1, 2.5, None, True]}}),
        ("{{ v | tojson(indent=2) }}", {"v": {"a": [1, {"b": "c"}]}}),
        ("{{ 10 % 3 }} {{ 10 // 3 }} {{ 2 ** 5 }} {{ -x }}", {"x": 4}),
        ("{{ 'a,b,c'.split(',') | last }}", {}),
        ("{{ n | int }} {{ 'nope' | int }} {{ '42' | int }}", {"n": 7.9}),
        ("{{ text | indent(2) }}", {"text": "l1\nl2\n\nl3"}),
        ("{{ text | indent(2, first=True) }}", {"text": "l1\nl2"}),
        ("{% set ns = namespace(found=false, n=0) %}"
         "{% for m in msgs %}{% if m.role == 'user' %}{% set ns.found = true %}"
         "{% set ns.n = ns.n + 1 %}{% endif %}{% endfor %}{{ ns.found }}:{{ ns.n }}",
         {"msgs": MULTI}),
        ("{% for i in range(5) %}{% if i == 3 %}{% break %}{% endif %}{{ i }}{% endfor %}", {}),
        ("{% for i in range(5) %}{% if i % 2 %}{% continue %}{% endif %}{{ i }}{% endfor %}", {}),
        ("{% for m in msgs if m.role != 'system' %}{{ loop.index }}:{{ m.role }} "
         "{% else %}none{% endfor %}", {"msgs": MULTI}),
        ("{% for x in [] %}{{ x }}{% else %}EMPTY{% endfor %}", {}),
        ("{% macro f(a, b='B') %}[{{ a }}|{{ b }}]{% endmacro %}{{ f(1) }}{{ f(1, 2) }}"
         "{{ f(a=3, b=4) }}", {}),
        ("{% set x %}in{{ 'ner' }}{% endset %}{{ x }}!", {}),
        ("{% filter trim %}  padded  {% endfilter %}|", {}),
        ("{{ loop is defined }}", {}),
        ("{{ msgs[0].get('role') }} {{ msgs[0].get('nope', 'dflt') }}", {"msgs": SIMPLE}),
        # (list.append is rejected by the oracle's ImmutableSandbox; ours
        # allows it — covered by the literal assert below instead)
        ("{{ d | items | map(attribute=1) | sum }}", {"d": {"a": 1, "b": 2}}),
        ("{{ words | unique | list | join(',') }}", {"words": ["a", "B", "A", "b", "c"]}),
        ("{{ x > 1 and x <= 3 or y }}", {"x": 2, "y": False}),
        ("{{ 'Hello World' | lower | replace('world', 'there') | title }}", {}),
        ("{{ c is string }} {{ c is mapping }} {{ c is iterable }}", {"c": [1]}),
        ("{{ 1 if a else 2 }}", {"a": None}),
    ]
    for src, v in cases:
        assert render(src, v) == oracle(src, v), src
    # ours permits list mutation (minja-style leniency; the oracle's
    # ImmutableSandbox rejects it, so no oracle comparison possible)
    assert render(
        "{% set l = [] %}{% for i in range(3) %}{{ l.append(i) or '' }}"
        "{% endfor %}{{ l | join('-') }}", {}) == "0-1-2"


def test_recursive_macro(oracle):
    src = (
        "{% macro walk(node) %}{% if node is mapping %}"
        "{% for k, v in node | items %}{{ k }}({{ walk(v) }}){% endfor %}"
        "{% else %}{{ node }}{% endif %}{% endmacro %}{{ walk(t) }}"
    )
    v = {"t": {"a": {"b": 1, "c": {"d": 2}}, "e": 3}}
    assert render(src, v) == oracle(src, v)


def test_raise_exception():
    with pytest.raises(TemplateError, match="boom"):
        render("{{ raise_exception('boom') }}", {})


def test_strftime_now_injectable():
    out = render("{{ strftime_now('%Y-%m-%d') }}", {}, now=FIXED_NOW)
    assert out == "2026-03-14"


def test_undefined_is_lenient():
    assert render("{{ nope }}|{{ nope.deep.chain | default('d') }}", {}) == "|d"


def test_set_scoping_matches_jinja(oracle):
    # set inside for does not leak (jinja scoping); namespace does
    src = (
        "{% set v = 'top' %}{% for i in range(2) %}{% set v = i %}{{ v }}{% endfor %}{{ v }}"
    )
    assert render(src, {}) == oracle(src, {})


def test_template_reuse():
    t = Template("{{ a }}+{{ b }}")
    assert t.render({"a": 1, "b": 2}) == "1+2"
    assert t.render({"a": "x", "b": "y"}) == "x+y"

"""ES-style REST URI pattern matcher (reference parity: G1).

Re-expresses the reference's two-pointer segment matcher
(/root/reference/pkg/es/base_es.go:114-189) that routes gateway
requests like `/a/b/_search` against patterns like
`/${index}?/${docType}?/_search`:

- a trailing `_action` segment in the pattern must match the URI's
  trailing `_action` exactly (both or neither);
- `${var}` segments are required and bind one URI segment;
- `${var}?` segments are optional; required segments bind from both
  ends first (two pointers), then optionals consume what remains from
  the front;
- unconsumed URI segments ⇒ no match.

The seven assertions of the reference's own unit suite
(pkg/es/base_es_test.go:8-55) are ported verbatim in
tests/test_uri.py. In this engine the matcher fronts the CLI/task
router (cli.py) — the analog of the gateway's method-rule dispatch.
"""

from __future__ import annotations


def _strip_var(seg: str) -> str:
    return seg.strip("${}?")


def match_rule(uri: str, pattern: str) -> tuple[dict[str, str], bool]:
    """Match `uri` against `pattern`; return (variables, matched)."""
    uri = uri.strip("/")
    pattern = pattern.strip("/")

    pat = pattern.split("/")
    suffix_pattern_action = ""
    if pat[-1].startswith("_"):
        suffix_pattern_action = pat[-1]
        pat = pat[:-1]

    us = uri.split("/")
    suffix_uri_action = ""
    if suffix_pattern_action and us[-1].startswith("_"):
        suffix_uri_action = us[-1]
        us = us[:-1]

    if suffix_pattern_action != suffix_uri_action:
        return {}, False

    u_lo, u_hi = 0, len(us) - 1
    p_lo, p_hi = 0, len(pat) - 1
    variables: dict[str, str] = {}

    def bind(p_seg: str, u_seg: str) -> bool:
        """${var} segments bind; literal segments must EQUAL the URI
        segment (a literal pattern like /_cat/indices must not swallow
        arbitrary URIs)."""
        if p_seg.startswith("${"):
            variables[_strip_var(p_seg)] = u_seg
            return True
        return p_seg.rstrip("?") == u_seg

    changed = True
    while u_lo <= u_hi and p_lo <= p_hi and changed:
        changed = False
        if not pat[p_lo].endswith("?"):
            if not bind(pat[p_lo], us[u_lo]):
                return {}, False
            u_lo += 1
            p_lo += 1
            changed = True
        if u_lo <= u_hi and p_lo <= p_hi and not pat[p_hi].endswith("?"):
            if not bind(pat[p_hi], us[u_hi]):
                return {}, False
            u_hi -= 1
            p_hi -= 1
            changed = True

    while p_lo <= p_hi:
        if not pat[p_lo].endswith("?"):
            return {}, False
        if u_lo <= u_hi and bind(pat[p_lo], us[u_lo]):
            u_lo += 1
        p_lo += 1

    if u_lo <= u_hi:
        return {}, False
    return variables, True


# Method→pattern routing table (the subset our CLI actions exercise —
# the analog of the reference's MethodRuleMap, base_es.go:190-217).
DEFAULT_RULES: dict[str, list[str]] = {
    "GET": [
        "/${index}?/${docType}?/_search",
        "/${index}/${docType}?/_count",
        "/${index}/${docType}/${docId}",
        "/_cat/indices",
    ],
    "POST": [
        "/${index}?/${docType}?/_search",
        "/_bulk",
        "/${index}/_bulk",
        "/${index}/${docType}/${docId}",
    ],
    "PUT": ["/${index}", "/${index}/${docType}/${docId}"],
    "DELETE": ["/${index}", "/${index}/${docType}/${docId}"],
}


def route(method: str, uri: str, rules: dict[str, list[str]] | None = None):
    """First matching pattern for (method, uri) → (pattern, variables),
    or (None, {}) — the gateway's MatchRule loop."""
    for pattern in (rules or DEFAULT_RULES).get(method.upper(), []):
        variables, ok = match_rule(uri, pattern)
        if ok:
            return pattern, variables
    return None, {}

"""Dev tool: line-level similarity between a repo file and a reference file.

Mirrors the judge's sweep: strip comments/docstrings/blank lines, normalize
whitespace, then report difflib ratio and the share of repo lines that appear
verbatim in the reference. Usage:

    python scripts/dev/similarity.py <repo_file> <reference_file>
"""

import difflib
import io
import sys
import tokenize


def normalized_lines(path: str) -> list[str]:
    src = open(path, encoding="utf-8").read()
    # Drop comments and docstrings via the token stream.
    out = []
    prev_end = (1, 0)
    keep = []
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    except tokenize.TokenError:
        toks = []
    drop_spans = []
    prev_significant = None
    for i, tok in enumerate(toks):
        if tok.type == tokenize.COMMENT:
            drop_spans.append((tok.start, tok.end))
        elif tok.type == tokenize.STRING:
            # A string expression statement == docstring-ish; drop it.
            if prev_significant in (None, tokenize.NEWLINE, tokenize.INDENT, tokenize.DEDENT):
                drop_spans.append((tok.start, tok.end))
        if tok.type not in (tokenize.NL, tokenize.COMMENT):
            prev_significant = tok.type
    lines = src.splitlines()
    dropped = set()
    for (srow, _), (erow, _) in drop_spans:
        for r in range(srow, erow + 1):
            dropped.add(r)
    for i, ln in enumerate(lines, start=1):
        if i in dropped:
            continue
        norm = " ".join(ln.split())
        if norm:
            out.append(norm)
    return out


def main():
    a, b = sys.argv[1], sys.argv[2]
    la, lb = normalized_lines(a), normalized_lines(b)
    ratio = difflib.SequenceMatcher(None, la, lb).ratio()
    ref_set = set(lb)
    verbatim = sum(1 for ln in la if ln in ref_set) / max(len(la), 1)
    print(f"{a} vs {b}: ratio={ratio:.2f} verbatim_share={verbatim:.2f} (lines {len(la)}/{len(lb)})")


if __name__ == "__main__":
    main()

"""Regenerate the module/function tables in DOCS.md from docstrings.

Usage: python tools/gen_docs.py   (rewrites DOCS.md below the header)
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.join(REPO, "dask_mwu_spark")
DOCS = os.path.join(REPO, "DOCS.md")
MARKER = "\n### `"


def tables() -> str:
    out = []
    for dirpath, _, files in sorted(os.walk(ROOT)):
        for fn in sorted(files):
            if not fn.endswith(".py") or fn.startswith("_"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, REPO)
            tree = ast.parse(open(path).read())
            pub = [
                n
                for n in tree.body
                if isinstance(n, (ast.FunctionDef, ast.ClassDef))
                and not n.name.startswith("_")
            ]
            if not pub:
                continue
            mod = (
                rel.replace("dask_mwu_spark/", "")
                .removesuffix(".py")
                .replace("/", ".")
            )
            out.append(f"\n### `{mod}`\n")
            out.append("| function | what it does |")
            out.append("|---|---|")
            for n in pub:
                doc = (
                    (ast.get_docstring(n) or "")
                    .split("\n\n")[0]
                    .replace("\n", " ")
                    .replace("|", "/")
                )
                if ". " in doc:
                    doc = doc.split(". ")[0] + "."
                if len(doc) > 220:
                    doc = doc[:217] + "..."
                args = ""
                if isinstance(n, ast.FunctionDef):
                    names = [
                        a.arg
                        for a in n.args.args + n.args.kwonlyargs
                        if a.arg != "self"
                    ]
                    args = (
                        "("
                        + ", ".join(names[:6])
                        + (", ..." if len(names) > 6 else "")
                        + ")"
                    )
                out.append(f"| `{n.name}{args}` | {doc} |")
    return "\n".join(out) + "\n"


def main() -> None:
    text = open(DOCS).read()
    header = text.split(MARKER)[0]
    open(DOCS, "w").write(header + tables())
    print("DOCS.md regenerated")


if __name__ == "__main__":
    main()

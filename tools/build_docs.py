"""Build the documentation site (reference parity: the reference's CI is
literally a Sphinx docs build, reference .travis.yml:26-30 +
docs/source/usage.rst; this environment has no sphinx/mkdocs, so this is a
self-contained builder on the stdlib-adjacent ``markdown`` package).

- Renders README.md (as index.html) and every docs/*.md to a styled HTML
  site with a shared nav bar.
- STRICT by default (the `mkdocs build --strict` equivalent): any
  relative link whose target file does not exist, and any .md file that
  fails to render, fails the build with a nonzero exit — so a renamed doc
  or a stale cross-reference breaks CI (tests/test_docs.py runs this into
  a temp dir).

Usage: python tools/build_docs.py [--out site] [--no-strict]
"""

import argparse
import os
import re
import sys

import markdown

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAGES = [("index", os.path.join(REPO, "README.md"), "Overview"),
         ("usage", os.path.join(REPO, "docs", "usage.md"), "Usage"),
         ("api", os.path.join(REPO, "docs", "api.md"), "API reference"),
         ("design", os.path.join(REPO, "docs", "design.md"), "Design notes"),
         ("goldens", os.path.join(REPO, "docs", "goldens.md"), "Golden values"),
         ("validation", os.path.join(REPO, "VALIDATION.md"), "Validation"),
         ("changelog", os.path.join(REPO, "CHANGELOG.md"), "Changelog")]

TEMPLATE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — lightcurve_fitting_tpu {version}</title>
<style>
body {{ font: 16px/1.6 system-ui, sans-serif; margin: 0; color: #1a1a1a; }}
nav {{ background: #20303f; padding: .6em 1.2em; }}
nav a {{ color: #cfe3f5; margin-right: 1.2em; text-decoration: none; }}
nav a.current {{ color: #fff; font-weight: 600; }}
nav span {{ color: #7d97ad; float: right; }}
main {{ max-width: 54em; margin: 0 auto; padding: 1em 1.5em 4em; }}
pre {{ background: #f4f6f8; padding: .8em 1em; overflow-x: auto;
      border-radius: 6px; font-size: 14px; }}
code {{ background: #f4f6f8; padding: .1em .3em; border-radius: 4px;
       font-size: 14px; }}
pre code {{ padding: 0; background: none; }}
table {{ border-collapse: collapse; }}
th, td {{ border: 1px solid #d4dade; padding: .3em .7em; }}
h1, h2, h3 {{ line-height: 1.25; }}
a {{ color: #14609e; }}
</style></head><body>
<nav>{nav}<span>lightcurve_fitting_tpu {version}</span></nav>
<main>{body}</main>
</body></html>
"""

# [text](target) — excluding images (handled the same way via the same regex)
_LINK_RE = re.compile(r"!?\[[^\]]*\]\(([^)#\s]+)(#[^)\s]*)?\)")


def check_links(md_path, text, known_pages):
    """Every relative link must point at an existing file (or a built page).
    Returns a list of broken-target descriptions."""
    broken = []
    base = os.path.dirname(md_path)
    for m in _LINK_RE.finditer(text):
        target = m.group(1)
        if re.match(r"^[a-z]+://", target) or target.startswith("mailto:"):
            continue  # external; zero-egress environment, can't verify
        if target.endswith(".md") and os.path.splitext(
                os.path.basename(target))[0] in known_pages:
            continue  # rewritten to a built page below
        if not os.path.exists(os.path.normpath(os.path.join(base, target))):
            broken.append(f"{os.path.relpath(md_path, REPO)}: "
                          f"broken link -> {target}")
    return broken


def rewrite_links(text, known_pages):
    """Point cross-references at the built pages (docs/usage.md -> usage.html)."""
    def repl(m):
        target, anchor = m.group(1), m.group(2) or ""
        name = os.path.splitext(os.path.basename(target))[0]
        if target.endswith(".md") and name in known_pages:
            page = "index" if name == "README" else name
            return m.group(0).replace(target + anchor,
                                      f"{page}.html{anchor}")
        return m.group(0)
    return _LINK_RE.sub(repl, text)


def build(outdir, strict=True, pages=PAGES):
    sys.path.insert(0, REPO)
    from lightcurve_fitting_tpu._version import get_version

    version = get_version()
    os.makedirs(outdir, exist_ok=True)
    known = {name for name, _, _ in pages} | {"README"}
    errors = []
    nav = "".join(f'<a href="{name}.html">{label}</a>'
                  for name, _, label in pages)
    for name, path, label in pages:
        if not os.path.exists(path):
            errors.append(f"missing source: {path}")
            continue
        text = open(path, encoding="utf-8").read()
        errors.extend(check_links(path, text, known))
        try:
            body = markdown.markdown(
                rewrite_links(text, known),
                extensions=["fenced_code", "tables", "toc", "sane_lists"])
        except Exception as exc:  # pragma: no cover - render failure path
            errors.append(f"{path}: render failed: {exc}")
            continue
        page_nav = nav.replace(f'<a href="{name}.html">',
                               f'<a class="current" href="{name}.html">')
        with open(os.path.join(outdir, f"{name}.html"), "w",
                  encoding="utf-8") as fh:
            fh.write(TEMPLATE.format(title=label, nav=page_nav, body=body,
                                     version=version))
    if errors:
        for e in errors:
            print(f"[docs] ERROR: {e}", file=sys.stderr)
        if strict:
            return 1
    print(f"[docs] built {len(pages)} pages -> {outdir} (version {version})")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "site"))
    ap.add_argument("--no-strict", action="store_true")
    cli = ap.parse_args()
    sys.exit(build(cli.out, strict=not cli.no_strict))

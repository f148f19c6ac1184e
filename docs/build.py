"""Static documentation builder (stdlib-only; the image has no mkdocs).

Generates a browsable markdown site under ``docs/site/``:

* ``reference/<module>.md`` — API reference pulled from docstrings of every
  public module in ``fastgaussianprocesses_tpu`` (mirrors the reference's
  mkdocstrings setup, mkdocs.yml + docs/api.md:3-7);
* ``examples/<name>.md`` — the example scripts rendered with their module
  docstrings as prose and the code fenced (mirrors mkdocs-jupyter rendering
  of the reference's notebook gallery);
* ``index.md`` — navigation.

Run: ``python docs/build.py`` (CI job: .github/workflows/docs.yml).
"""

import importlib
import inspect
import os
import pkgutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SITE = os.path.join(ROOT, "docs", "site")
sys.path.insert(0, ROOT)

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _anchor(text):
    return text.strip().lower().replace(" ", "-").replace(".", "")


def document_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    if mod.__doc__:
        lines += [inspect.cleandoc(mod.__doc__), ""]
    for name, obj in sorted(vars(mod).items()):
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue
        if inspect.isclass(obj):
            lines += [f"## class `{name}`", ""]
            if obj.__doc__:
                lines += [inspect.cleandoc(obj.__doc__), ""]
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(meth):
                    continue
                doc = inspect.getdoc(meth)
                if not doc:
                    continue
                try:
                    sig = str(inspect.signature(meth))
                except (TypeError, ValueError):
                    sig = "(...)"
                lines += [f"### `{name}.{mname}{sig}`", "", doc, ""]
        elif inspect.isfunction(obj):
            doc = inspect.getdoc(obj)
            if not doc:
                continue
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = "(...)"
            lines += [f"## `{name}{sig}`", "", doc, ""]
    return "\n".join(lines)


def render_example(path: str) -> str:
    with open(path) as fh:
        src = fh.read()
    name = os.path.basename(path)
    prose = ""
    body = src
    if src.startswith('"""'):
        end = src.index('"""', 3)
        prose = inspect.cleandoc(src[3:end])
        body = src[end + 3:].lstrip("\n")
    return f"# {name}\n\n{prose}\n\n```python\n{body}\n```\n"


def main():
    import fastgaussianprocesses_tpu as pkg

    os.makedirs(os.path.join(SITE, "reference"), exist_ok=True)
    os.makedirs(os.path.join(SITE, "examples"), exist_ok=True)
    modules = []
    for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        if "._native" in info.name:
            continue
        modules.append(info.name)
    nav_ref = []
    for modname in sorted(modules):
        try:
            md = document_module(modname)
        except Exception as e:  # document what imports; never fail the build
            md = f"# `{modname}`\n\n(import failed during doc build: {e})\n"
        short = modname.replace(pkg.__name__ + ".", "").replace(".", "_") or "package"
        out = os.path.join(SITE, "reference", short + ".md")
        with open(out, "w") as fh:
            fh.write(md)
        nav_ref.append((modname, f"reference/{short}.md"))
    nav_ex = []
    exdir = os.path.join(ROOT, "examples")
    for fname in sorted(os.listdir(exdir)):
        if not fname.endswith(".py"):
            continue
        out = os.path.join(SITE, "examples", fname[:-3] + ".md")
        with open(out, "w") as fh:
            fh.write(render_example(os.path.join(exdir, fname)))
        nav_ex.append((fname, f"examples/{fname[:-3]}.md"))
    index = ["# fastgaussianprocesses_tpu", "",
             "TPU-native fast Gaussian processes in O(n log n) "
             "(capability parity with `fastgps`).", "",
             "- [Design](../design.md)", "- [API overview](../api.md)", "",
             "## API reference", ""]
    index += [f"- [`{m}`]({p})" for m, p in nav_ref]
    index += ["", "## Examples", ""]
    index += [f"- [{n}]({p})" for n, p in nav_ex]
    with open(os.path.join(SITE, "index.md"), "w") as fh:
        fh.write("\n".join(index) + "\n")
    n_files = sum(len(files) for _, _, files in os.walk(SITE))
    print(f"built {n_files} pages under {SITE}")
    assert n_files >= len(modules), "doc build produced too few pages"


if __name__ == "__main__":
    main()

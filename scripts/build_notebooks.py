"""Build + execute the real .ipynb notebooks from docs/notebooks/*.py.

The reference ships four .ipynb documentation notebooks
(docs/Flight_probability_functions.ipynb et al.); this build keeps the
content as jupytext percent-format scripts (testable as plain Python,
tests/test_notebooks.py) and derives the actual notebook artifacts from
them: parse the `# %%` cells, append an inline-display cell after every
figure save (so the rendered output is IN the notebook, not just on
disk), execute with nbclient on CPU, and write
``docs/notebooks/<name>.ipynb`` with outputs embedded.

The scripts stay the single source of truth — regenerate with
``python scripts/build_notebooks.py`` after editing them.
"""

import os
import re
import sys

import nbformat
from nbclient import NotebookClient

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NB_DIR = os.path.join(REPO, 'docs', 'notebooks')

# a figure lands on disk either via fig.savefig(...) or a plotting
# helper's outfile= kwarg; both point into OUT (possibly line-wrapped)
_SAVEFIG = re.compile(
    r"(?:savefig\(|outfile=)os\.path\.join\(\s*OUT,\s*'([^']+)'\)", re.S)


def parse_percent(text):
    """percent-format script -> list of (kind, source) cells."""
    cells = []
    kind, buf = None, []

    def flush():
        if kind is not None and ''.join(buf).strip():
            src = ''.join(buf).strip('\n')
            if kind == 'markdown':
                src = '\n'.join(line[2:] if line.startswith('# ') else
                                ('' if line == '#' else line)
                                for line in src.split('\n'))
            cells.append((kind, src))

    for line in text.split('\n'):
        if line.startswith('# %% [markdown]'):
            flush()
            kind, buf = 'markdown', []
        elif line.startswith('# %%'):
            flush()
            kind, buf = 'code', []
        elif kind is not None:
            buf.append(line + '\n')
    flush()
    return cells


def build(script_path, execute=True):
    name = os.path.splitext(os.path.basename(script_path))[0]
    with open(script_path) as f:
        cells = parse_percent(f.read())

    nb = nbformat.v4.new_notebook()
    nb.metadata['kernelspec'] = {'name': 'python3', 'language': 'python',
                                 'display_name': 'Python 3'}
    # notebook kernels have no __file__; the scripts use it for sys.path
    # and the out/ dir, so pin it to the script's repo-relative path
    # (execution cwd is the repo root)
    nb.cells.append(nbformat.v4.new_code_cell(
        "__file__ = {!r}   # kernel has no __file__; scripts need it"
        .format(os.path.join('docs', 'notebooks', name + '.py'))))
    for kind, src in cells:
        if kind == 'markdown':
            nb.cells.append(nbformat.v4.new_markdown_cell(src))
            continue
        nb.cells.append(nbformat.v4.new_code_cell(src))
        pngs = _SAVEFIG.findall(src)
        if pngs:
            disp = ['from IPython.display import Image, display']
            disp += ["display(Image(filename=os.path.join(OUT, '{}')))"
                     .format(p) for p in pngs]
            nb.cells.append(nbformat.v4.new_code_cell('\n'.join(disp)))

    if execute:
        os.environ.setdefault('JAX_PLATFORMS', 'cpu')
        client = NotebookClient(nb, timeout=900, kernel_name='python3',
                                resources={'metadata': {'path': REPO}})
        client.execute()
    out = os.path.join(NB_DIR, name + '.ipynb')
    nbformat.write(nb, out)
    return out


def main():
    execute = '--no-execute' not in sys.argv
    scripts = [os.path.join(NB_DIR, f) for f in sorted(os.listdir(NB_DIR))
               if f.endswith('.py')]
    for s in scripts:
        print('building', os.path.basename(s),
              '(executing)' if execute else '(no execute)', flush=True)
        print('wrote', build(s, execute=execute), flush=True)


if __name__ == '__main__':
    main()

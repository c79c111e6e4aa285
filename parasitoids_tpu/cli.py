"""Command-line simulation driver (L5).

The reference entry point is ``python Run.py [flags]`` (Run.py:523-531);
ours is ``python -m parasitoids_tpu [flags]`` with the same flag surface
(``--pop``, ``--kalbar``, ``--carnarvon``, ``key=value`` overrides, ...),
phase timing prints, reference-format npz/json outputs and optional
plotting.
"""

from __future__ import annotations

import sys
import time

from .config import Params
from .io.save import save_run
from .models.forward import setup_forward, simulate
from .utils.cache import enable_compilation_cache


_USAGE = """\
usage: python -m parasitoids_tpu [flags] [key=value ...]

flags:
  --pop / --prob          population vs single-wasp probability model
  --kalbar / --carnarvon  dataset preset (release schedule, wind files)
  --plot / --no_plot      write per-day figures after the run
  --output / --no_output  save <outfile>.npz + .json (reference format)

key=value overrides set any Params field, e.g.:
  ndays=5 'domain_info=(8000.0,320)' n_periods=20 outfile=output/run
  use_f64=True            float64 validation mode (XLA path)

See README.md for the full command map.
"""


def main(params: Params | None = None, argv=None):
    if params is None and \
            any(a in ('-h', '--help')
                for a in (sys.argv[1:] if argv is None else argv)):
        print(_USAGE)
        return None, None
    enable_compilation_cache()
    if params is None:
        params = Params()
        if argv is None:
            argv = sys.argv[1:]
        if argv:
            params.cmd_line_chg(argv)

    tic_total = time.time()
    setup = setup_forward(params)
    print('Simulating {} days of {} on a {}x{} grid ({} model)...'.format(
        setup.ndays, params.site_name, setup.scfg.dom_len,
        setup.scfg.dom_len, 'probability' if params.PROB_MODEL else
        'population'))

    timing = {}
    fields, days = simulate(params, setup, timing=timing)
    print('Kernel phase: {:.3f} s'.format(timing['kernel_phase']))
    print('Convolution phase: {:.3f} s'.format(timing['conv_phase']))
    print('Total time elapsed: {:.3f} s'.format(time.time() - tic_total))

    # numerical sanitizers (ref ParasitoidModel.py:528-599 assertion layer)
    from .utils.checks import validate_fields
    validate_fields(fields, params, params.PROB_MODEL)

    if params.OUTPUT:
        print('Saving to {}...'.format(params.outfile))
        save_run(params.outfile, fields, days, params)

    if params.PLOT:
        from .viz.plot_result import plot_all
        plot_all(fields, days, params)

    return fields, days


if __name__ == '__main__':
    main()

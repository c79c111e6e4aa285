"""Model-vs-data comparison figures (L5).

Rebuilds ``CompareToData.py``: spread maps side by side with emergence-data
histograms (ref main :50-340), model-vs-observed grid-count assessment
(``assess_fit`` :344-528), and a multi-day banner figure (:532-778).
Normalization conventions follow the reference: observed emergence divided
by sampled area (:100-105), model densities projected through the
incubation distribution before comparison (:124-132).
"""

from __future__ import annotations


import numpy as np

from ..models.observe import ObservationOps
from .plot_result import alpha_viridis, crop_to_support, _extent_meters

__all__ = ['compare_emergence', 'assess_fit', 'banner', 'main']


from . import _mpl   # shared headless-backend helper

def compare_emergence(fields, days, params, locinfo, outfile=None,
                      bw=False):
    """Side-by-side observed vs model-projected emergence per collection
    (ref CompareToData.main; ``bw`` gives the print-friendly grayscale
    styling of the reference's ``--bw`` flag, CompareToData.py:782-834).
    """
    plt = _mpl()
    obs_ops = ObservationOps(locinfo, params.domain_info, len(days))
    rel_model, sent_model = obs_ops.project_emergence_np(fields)
    ncoll = len(locinfo.release_emerg)
    fig, axes = plt.subplots(2, ncoll + 1, figsize=(6 * (ncoll + 1), 8),
                             squeeze=False)

    # spread map of the final day
    rad_res = int(params.domain_info[1])
    cell = params.domain_info[0] / params.domain_info[1]
    cropped, window = crop_to_support(np.asarray(fields[-1]))
    axes[0][0].imshow(np.ma.masked_less_equal(cropped,
                                              cropped.max() * 1e-3),
                      cmap=('Greys' if bw else alpha_viridis()),
                      extent=_extent_meters(window, rad_res, cell))
    axes[0][0].set_title('model spread, day {} PR'.format(days[-1]))
    axes[1][0].axis('off')

    cell_area = cell ** 2
    for k in range(ncoll):
        # observed emergence normalized by sampled area: the release-field
        # total is scaled by the single scalar 100/area.sum() — grid
        # collection sampled that combined area — NOT per-grid-point rows
        # (which are in (datePR,row,col) order, unrelated to the area
        # column's file order).  Ref CompareToData.py:100-105.
        area_total = float(locinfo.grid_data['area'].to_numpy(float).sum())
        obs = (locinfo.release_emerg[k].sum(axis=0) *
               100.0 / max(area_total, 1e-9))
        model = np.asarray(rel_model[k])
        x = np.arange(obs.shape[0])
        sty_o = dict(color='0.2') if bw else {}
        sty_m = (dict(color='white', edgecolor='black', hatch='//')
                 if bw else {})
        axes[0][k + 1].bar(x - 0.2, obs, width=0.4,
                           label='observed/area', **sty_o)
        axes[0][k + 1].bar(x + 0.2, model.sum(axis=0) /
                           max(model.sum(), 1e-9) * obs.sum(), width=0.4,
                           label='model (scaled)', **sty_m)
        axes[0][k + 1].set_title('release-field emergence, collection '
                                 '{}'.format(k))
        axes[0][k + 1].legend()

        # sentinel rows are per-field (sent_ids order): normalize each by
        # its field area, 10000/(cells * m^2/cell), before summing
        # (ref CompareToData.py:105)
        sent_scale = np.array([10000.0 /
                               (locinfo.field_sizes[sid] * cell_area)
                               for sid in locinfo.sent_ids])
        obs_s = locinfo.sentinel_emerg[k] * sent_scale[:, None]
        model_s = np.asarray(sent_model[k])
        xs = np.arange(obs_s.shape[1])
        axes[1][k + 1].bar(xs - 0.2, obs_s.sum(axis=0), width=0.4,
                           label='observed', **sty_o)
        axes[1][k + 1].bar(xs + 0.2, model_s.sum(axis=0) /
                           max(model_s.sum(), 1e-9) * obs_s.sum(),
                           width=0.4, label='model (scaled)', **sty_m)
        axes[1][k + 1].set_title('sentinel emergence, collection '
                                 '{}'.format(k))
        axes[1][k + 1].legend()

    fig.tight_layout()
    outfile = outfile or 'compare_emergence.png'
    fig.savefig(outfile, dpi=130)
    plt.close(fig)
    return outfile


def assess_fit(fields, days, params, locinfo, outfile=None, bw=False):
    """Model grid densities vs observed grid counts per observation day
    (ref CompareToData.assess_fit, :344-528): per-point separation with
    sampling-effort annotation."""
    plt = _mpl()
    obs_ops = ObservationOps(locinfo, params.domain_info, len(days))
    grid_model = np.asarray(obs_ops.project_grid_np(fields))
    n_days = grid_model.shape[1]
    fig, axes = plt.subplots(1, n_days, figsize=(5 * n_days, 4),
                             squeeze=False)
    for d in range(n_days):
        ax = axes[0][d]
        # apply the per-point sampling effort exactly as the likelihood
        # does (model.py: grid_obs_prob * grid_samples * density) —
        # without it, a half-effort point reads as model over-prediction
        effort = np.asarray(locinfo.grid_samples[:, d])
        expected = grid_model[:, d] * effort
        order = np.argsort(expected)
        scale = (locinfo.grid_obs[:, d].sum() /
                 max(expected.sum(), 1e-9))
        mline = dict(color='0.1') if bw else {}
        mdots = dict(color='0.5') if bw else {}
        ax.plot(expected[order] * scale, label='model (effort-scaled)',
                **mline)
        ax.plot(locinfo.grid_obs[order, d], '.', label='observed',
                **mdots)
        ax.set_title('grid counts, obs day {}'.format(
            locinfo.grid_obs_datesPR[d].days))
        ax.set_xlabel('grid point (sorted by model)')
        ax.legend()
    fig.tight_layout()
    outfile = outfile or 'assess_fit.png'
    fig.savefig(outfile, dpi=130)
    plt.close(fig)
    return outfile


def banner(fields, days, params, locinfo=None, outfile=None, ncols=6,
           bw=False):
    """Multi-day spread banner (ref CompareToData.banner, :532-778)."""
    plt = _mpl()
    fields = np.asarray(fields)
    idxs = np.linspace(0, len(days) - 1, min(ncols, len(days))).astype(int)
    rad_res = int(params.domain_info[1])
    cell = params.domain_info[0] / params.domain_info[1]
    _, window = crop_to_support(fields[-1])
    r0, r1, c0, c1 = window
    extent = _extent_meters(window, rad_res, cell)
    fig, axes = plt.subplots(1, len(idxs), figsize=(3.2 * len(idxs), 3.6))
    vmax = np.percentile(fields[-1][r0:r1, c0:c1], 99.9)
    for ax, i in zip(np.atleast_1d(axes), idxs):
        ax.imshow(np.ma.masked_less_equal(fields[i][r0:r1, c0:c1], 0),
                  cmap=('Greys' if bw else alpha_viridis()),
                  extent=extent, vmax=vmax)
        if locinfo is not None:
            for poly in locinfo.field_polys.values():
                ax.plot(*np.vstack([poly, poly[:1]]).T,
                        'k-' if bw else 'r-', lw=0.5)
            ax.set_xlim(extent[0], extent[1])
            ax.set_ylim(extent[2], extent[3])
        ax.set_title('day {}'.format(days[i]), fontsize=9)
        ax.tick_params(labelsize=6)
    fig.tight_layout()
    outfile = outfile or 'banner.png'
    fig.savefig(outfile, dpi=130)
    plt.close(fig)
    return outfile


def main(argv=None):
    import sys
    from ..config import Params
    from ..io.locinfo import LocInfo
    from ..io.save import load_run
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print('usage: python -m parasitoids_tpu.viz.compare <saved_run> '
              '[-b|-a] [--bw]')
        return
    # accept the on-disk .npz name too (tab completion); the sidecar
    # reader and load_run both want the base path
    path = argv[0].removesuffix('.npz')
    params = Params()
    params.file_read_chg(path)
    dom_len = int(params.domain_info[1]) * 2 + 1
    fields, days = load_run(path, dom_len)
    locinfo = LocInfo(params.dataset, tuple(params.coord),
                      tuple(params.domain_info))
    bw = '--bw' in argv
    if '-b' in argv:
        print('wrote', banner(fields, days, params, locinfo, bw=bw))
    elif '-a' in argv:
        print('wrote', assess_fit(fields, days, params, locinfo, bw=bw))
    else:
        print('wrote', compare_emergence(fields, days, params, locinfo,
                                         bw=bw))


if __name__ == '__main__':
    main()

"""Interactive model explorer (L5).

Rebuilds ``Plot_ParasitoidModel.py``: quick visualizations of each analytic
sub-function (g wind logistic, f time-of-day pmf, h take-off probability
over a real wind day, and a single daily kernel) for parameter exploration
in an IPython session or from the CLI.
"""

from __future__ import annotations


import numpy as np

__all__ = ['plot_g_wind_prob', 'plot_f_time_prob', 'plot_h_flight_prob',
           'plot_daily_kernel']


from . import _mpl   # shared headless-backend helper

def plot_g_wind_prob(aw=1.8, bw=6.0, outfile=None, show=False):
    from ..ops.flight import g_wind_prob
    plt = _mpl()
    w = np.linspace(0, 4, 200)
    fig, ax = plt.subplots()
    ax.plot(w, np.asarray(g_wind_prob(w, aw, bw)))
    ax.set_xlabel('wind speed (m/s)')
    ax.set_ylabel('take-off probability factor g')
    ax.set_title('g(wind; aw={}, bw={})'.format(aw, bw))
    return _finish(fig, outfile or 'g_wind_prob.png', show)


def plot_f_time_prob(n=48, a1=7.0, b1=2.0, a2=19.0, b2=2.0, outfile=None,
                     show=False):
    from ..ops.flight import f_time_prob
    plt = _mpl()
    t = np.linspace(0, 24, n, endpoint=False)
    fig, ax = plt.subplots()
    ax.plot(t, np.asarray(f_time_prob(n, a1, b1, a2, b2)))
    ax.set_xlabel('hour of day')
    ax.set_ylabel('take-off pmf f')
    ax.set_title('f(t; {}, {}, {}, {})'.format(a1, b1, a2, b2))
    return _finish(fig, outfile or 'f_time_prob.png', show)


def plot_h_flight_prob(site='data/kalbar', day_index=0, interp=30,
                       start_time='00:00', lam=1.0, aw=1.8, bw=6.0,
                       a1=7.0, b1=2.0, a2=19.0, b2=2.0, outfile=None,
                       show=False):
    from ..io.wind import get_wind_data
    from ..ops.flight import h_flight_prob
    plt = _mpl()
    wind_data, days = get_wind_data(site, interp, start_time)
    w = wind_data[days[day_index]]
    h = np.asarray(h_flight_prob(w[:, 2], lam, aw, bw, a1, b1, a2, b2))
    t = np.linspace(0, 24, len(h), endpoint=False)
    fig, (ax1, ax2) = plt.subplots(2, 1, sharex=True)
    ax1.plot(t, w[:, 2])
    ax1.set_ylabel('wind speed (m/s)')
    ax2.plot(t, h)
    ax2.set_ylabel('take-off probability h')
    ax2.set_xlabel('hour of day')
    fig.suptitle('day {} ({})'.format(days[day_index], site))
    return _finish(fig, outfile or 'h_flight_prob.png', show)


def plot_daily_kernel(site='data/kalbar', day_index=0, outfile=None,
                      show=False, **param_overrides):
    """Build and display one daily dispersal kernel
    (ref Plot_ParasitoidModel.plot_prob_mass)."""
    import jax.numpy as jnp
    from ..config import Params
    from ..io.wind import get_wind_data, pack_wind
    from ..models.forward import _auto_half_width
    from ..ops.daily_kernel import KernelConfig, build_daily_kernel
    from .plot_result import alpha_viridis, crop_to_support, _extent_meters
    plt = _mpl()
    p = Params()
    for k, v in param_overrides.items():
        setattr(p, k, v)
    p.domain_info = getattr(p, 'domain_info', (10000.0, 400))
    wind_data, days = get_wind_data(site, p.interp_num, p.start_time)
    packed = pack_wind(wind_data, days)
    flat = jnp.asarray(packed.reshape(-1, 2), jnp.float32)
    cs = jnp.concatenate([jnp.zeros((1, 2), flat.dtype),
                          jnp.cumsum(flat, axis=0)])
    cell = p.domain_info[0] / p.domain_info[1]
    K = (p.kernel_rad if p.kernel_rad is not None
         else _auto_half_width(p.Dparams, cell))
    Kl = (p.kernel_rad_local if p.kernel_rad_local is not None
          else _auto_half_width(p.Dlparams, cell, lo=3))
    kcfg = KernelConfig(rad_res=int(p.domain_info[1]),
                        periods=packed.shape[1], K=int(K),
                        K_local=int(Kl), G=p.quad_nodes)
    hp = (p.lam, *p.g_params, *p.f_params)
    pmf, loss = build_daily_kernel(flat, cs, jnp.int32(day_index), hp,
                                   p.Dparams, p.Dlparams, p.mu_r,
                                   jnp.int32(p.n_periods), p.domain_info[0],
                                   jnp.int32(0), kcfg)
    pmf = np.asarray(pmf)
    cell = p.domain_info[0] / p.domain_info[1]
    cropped, window = crop_to_support(pmf)
    fig, ax = plt.subplots(figsize=(7, 6))
    im = ax.imshow(np.ma.masked_less_equal(cropped, 0),
                   cmap=alpha_viridis(),
                   extent=_extent_meters(window, int(p.domain_info[1]),
                                         cell))
    ax.set_title('daily kernel, day {} (loss={:.2e})'.format(
        days[day_index], float(loss)))
    fig.colorbar(im, ax=ax)
    return _finish(fig, outfile or 'daily_kernel.png', show)


def _finish(fig, outfile, show):
    plt = _mpl()
    if show:
        plt.show()
        plt.close(fig)
        return None          # nothing was written; don't return a path
    fig.savefig(outfile, dpi=130, bbox_inches='tight')
    plt.close(fig)
    return outfile


if __name__ == '__main__':
    print(plot_g_wind_prob())
    print(plot_f_time_prob())
    print(plot_h_flight_prob())
    print(plot_daily_kernel())

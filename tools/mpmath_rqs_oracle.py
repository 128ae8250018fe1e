"""30-digit mpmath oracle for the rational-quadratic spline path.

VERDICT round-2 item 1b: high-precision ground truth for
forward/inverse/log-det of the monotone RQS (Durkan et al. 2019, the
semantics of tfp.bijectors.RationalQuadraticSpline as used by the
reference) **through the exact reference activation chain** —

    bin positions:  softmax(raw) * (bin_max - bin_min - K*1e-2) + 1e-2
                    (vaemolsim/flows.py:86-93)
    knot slopes:    softplus(raw) + 1e-2        (vaemolsim/flows.py:95-101)
    boundary derivatives fixed to 1; identity with zero log-det outside
    [bin_min, bin_min + total].

Everything below is evaluated with mpmath at 30 significant digits (no
float32/float64 anywhere in the math), then rounded to float64 for the
goldens file.  tests/test_rqs_oracle.py compares this framework's
float32 implementation (ops/rqs.py via flows/spline_flows.py
activations) against these values.

Run:  python tools/mpmath_rqs_oracle.py
"""

import json
import os

import mpmath as mp
import numpy as np

mp.mp.dps = 30

RNG_SEED = 20260817
FLOOR = mp.mpf("0.01")  # the reference's 1e-2 activation floor


def softmax_mp(row):
    m = max(row)
    exps = [mp.e ** (v - m) for v in row]
    s = sum(exps)
    return [e / s for e in exps]


def softplus_mp(v):
    # log1p(exp(v)) stable on both sides.
    if v > 0:
        return v + mp.log1p(mp.e ** (-v))
    return mp.log1p(mp.e ** v)


def bin_positions_mp(raw_row, bin_min, bin_max, K):
    sm = softmax_mp(raw_row)
    scale = mp.mpf(bin_max) - mp.mpf(bin_min) - K * FLOOR
    return [v * scale + FLOOR for v in sm]


def slopes_mp(raw_row):
    return [softplus_mp(v) + FLOOR for v in raw_row]


def knots_mp(widths, bin_min):
    out = [mp.mpf(bin_min)]
    for w in widths:
        out.append(out[-1] + w)
    return out


def rqs_forward_mp(x, widths, heights, slopes, bin_min):
    """(y, log|dy/dx|) with identity tails.  slopes: K-1 interior values;
    boundary derivatives are 1."""
    xk = knots_mp(widths, bin_min)
    yk = knots_mp(heights, bin_min)
    d = [mp.mpf(1)] + list(slopes) + [mp.mpf(1)]
    x = mp.mpf(x)
    if x < xk[0] or x > xk[-1]:
        return x, mp.mpf(0)
    k = 0
    for i in range(1, len(xk) - 1):
        if x >= xk[i]:
            k = i
    w, h = widths[k], heights[k]
    s = h / w
    xi = (x - xk[k]) / w
    om = 1 - xi
    den = s + (d[k + 1] + d[k] - 2 * s) * xi * om
    y = yk[k] + h * (s * xi * xi + d[k] * xi * om) / den
    deriv = (s * s) * (d[k + 1] * xi * xi + 2 * s * xi * om
                       + d[k] * om * om) / (den * den)
    return y, mp.log(deriv)


def rqs_inverse_mp(y, widths, heights, slopes, bin_min):
    """(x, log|dx/dy|) by exact quadratic solve in 30-digit arithmetic."""
    xk = knots_mp(widths, bin_min)
    yk = knots_mp(heights, bin_min)
    d = [mp.mpf(1)] + list(slopes) + [mp.mpf(1)]
    y = mp.mpf(y)
    if y < yk[0] or y > yk[-1]:
        return y, mp.mpf(0)
    k = 0
    for i in range(1, len(yk) - 1):
        if y >= yk[i]:
            k = i
    w, h = widths[k], heights[k]
    s = h / w
    t = y - yk[k]
    dsum = d[k + 1] + d[k] - 2 * s
    a = h * (s - d[k]) + t * dsum
    b = h * d[k] - t * dsum
    c = -s * t
    disc = b * b - 4 * a * c
    xi = (2 * c) / (-b - mp.sqrt(disc))
    x = xk[k] + xi * w
    om = 1 - xi
    den = s + dsum * xi * om
    deriv = (s * s) * (d[k + 1] * xi * xi + 2 * s * xi * om
                       + d[k] * om * om) / (den * den)
    return x, -mp.log(deriv)


def main():
    rng = np.random.default_rng(RNG_SEED)
    configs = [
        # The reference defaults: 32 bins on [-10, 10] (flows.py:106-109).
        {"name": "reference_default", "num_bins": 32,
         "bin_range": [-10.0, 10.0], "n_splines": 6},
        # A tight/narrow config exercising large curvature per bin.
        {"name": "narrow", "num_bins": 8, "bin_range": [-4.0, 4.0],
         "n_splines": 6},
    ]
    cases = []
    for cfg in configs:
        K = cfg["num_bins"]
        lo, hi = cfg["bin_range"]
        for j in range(cfg["n_splines"]):
            raw_w = (rng.normal(size=K) * 2.0).astype(np.float32)
            raw_h = (rng.normal(size=K) * 2.0).astype(np.float32)
            raw_s = (rng.normal(size=K - 1) * 2.0).astype(np.float32)
            # Evaluation points: interior grid, near-boundary, outside
            # (tails), and points that land very close to knots.
            xs = list(np.linspace(lo + 1e-3, hi - 1e-3, 9))
            xs += [lo - 1.5, hi + 1.5, lo + 1e-4, hi - 1e-4]
            w_mp = bin_positions_mp([mp.mpf(float(v)) for v in raw_w],
                                    lo, hi, K)
            # knot-adjacent probes from the true high-precision knots
            xknots = knots_mp(w_mp, lo)
            xs += [float(xknots[K // 2] + mp.mpf("1e-6")),
                   float(xknots[K // 3] - mp.mpf("1e-6"))]
            xs = [float(np.float32(v)) for v in xs]

            h_mp = bin_positions_mp([mp.mpf(float(v)) for v in raw_h],
                                    lo, hi, K)
            s_mp = slopes_mp([mp.mpf(float(v)) for v in raw_s])

            fy, fldj, ix, ildj, rt = [], [], [], [], []
            for x in xs:
                y, ld = rqs_forward_mp(x, w_mp, h_mp, s_mp, lo)
                fy.append(float(y))
                fldj.append(float(ld))
                # Inverse evaluated at the same grid values (as y).
                xv, ild = rqs_inverse_mp(x, w_mp, h_mp, s_mp, lo)
                ix.append(float(xv))
                ildj.append(float(ild))
                # Round-trip closure at 30 digits (oracle self-check).
                x_back, _ = rqs_inverse_mp(y, w_mp, h_mp, s_mp, lo)
                rt.append(float(abs(x_back - mp.mpf(x))))
            assert max(rt) < 1e-20, (cfg["name"], j, max(rt))
            cases.append({
                "config": cfg["name"], "num_bins": K,
                "bin_range": [lo, hi],
                "raw_w": [float(v) for v in raw_w],
                "raw_h": [float(v) for v in raw_h],
                "raw_s": [float(v) for v in raw_s],
                "x": xs,
                "forward_y": fy, "forward_ldj": fldj,
                "inverse_x": ix, "inverse_ildj": ildj,
            })

    goldens = {
        "source": "mpmath",
        "generator": {"script": "tools/mpmath_rqs_oracle.py",
                      "seed": RNG_SEED, "dps": mp.mp.dps,
                      "note": ("30-significant-digit ground truth for "
                               "the RQS spline through the reference "
                               "activation chain (floors 1e-2, boundary "
                               "slopes 1, identity tails).")},
        "cases": cases,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", "rqs_mpmath.json")
    with open(out, "w") as f:
        json.dump(goldens, f)
    print(f"wrote {out} ({len(cases)} spline cases)")


if __name__ == "__main__":
    main()

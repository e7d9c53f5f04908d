"""HLO collective-volume scaling analysis (VERDICT r4 next-step #4).

The virtual-device proxy in tools/scaling_efficiency.py measures
partitioning overhead on an oversubscribed host; it cannot bound what a
real ICI fabric would add or hide. This tool produces the missing
evidence: for fit_large (all three distributed factorizations) and the
sharded-chains HMC step at 2/4/8 devices it

  1. compiles the REAL jitted program on an N-virtual-device CPU mesh
     (fresh subprocess per N — the device count is fixed at backend init),
  2. parses the optimized HLO for collective ops (all-gather, all-reduce,
     reduce-scatter, collective-permute) and sums their result bytes,
     multiplying collectives that sit inside `while` bodies (fori_loop
     lowering) by the loop trip count recovered from the loop-condition
     constant,
  3. models per-device wall-clock on v5e/v5p as
         T(N) = t_serial + t_parallel/N + t_comm(N)
     with t_* from the measured single-chip fp32 GEMM rate (bench.py
     cholesky number) and public ICI bandwidths, and reports the
     predicted scaling efficiency  eff(N) = T(1) / (N * T(N)).

Communication cost model (per device, one-direction ring schedules):
  all-gather of S result bytes      -> S * (N-1)/N received
  all-reduce of S bytes             -> 2 * S * (N-1)/N moved
  reduce-scatter of S shard bytes   -> S * (N-1) moved
  collective-permute of S bytes     -> S moved
ICI assumptions (public figures, jax-ml scaling-book convention): v5e
45 GB/s/link/direction with 4 links (2D torus), v5p 90 GB/s/link with 6
links (3D torus); a 1D-mesh ring uses 2 links -> effective one-direction
bandwidth 90 GB/s (v5e) / 180 GB/s (v5p). These are stated inputs, not
measurements — the OUTPUT to trust is the ratio structure (comm bytes vs
compute flops), which comes from the compiled HLO of the real program.

Run: python tools/collective_analysis.py   -> merges an "analytic" section
into SCALING.json and prints it.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEVICE_COUNTS = (2, 4, 8)
N_FIT = 2048          # same shape the scaling proxy runs
BLOCK = 128

# measured on the project's own chip (BENCH_r04: 24.05 fp32 TFLOPs
# achieved Cholesky) — used for t_compute so the model reflects achieved,
# not peak, rates; v5p scaled by the public peak ratio 459/197
ACHIEVED_FP32 = {"v5e": 24.0e12, "v5p": 24.0e12 * 459.0 / 197.0}
ICI_RING_BW = {"v5e": 90e9, "v5p": 180e9}   # one-direction, 2 links of a ring

_CHILD = r"""
import json, re, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

n_dev = int(sys.argv[1])
devices = jax.devices()
assert len(devices) == n_dev, (len(devices), n_dev)

from jax.sharding import NamedSharding, PartitionSpec as P
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.inference import MLEConfig
from gp_emu_uqsa_tpu.inference.hmc import HMCConfig, hmc_sample, make_gp_logdensity
from gp_emu_uqsa_tpu.kernels import make_params
from gp_emu_uqsa_tpu.parallel import make_mesh
from gp_emu_uqsa_tpu.parallel.large_fit import fit_large

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
               "u32": 4, "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}
SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|pred|s8|u8)\[([0-9,]*)\]")
COLL_RE = re.compile(r"=\s+(.+?)\s+(all-gather|all-reduce|reduce-scatter|"
                     r"collective-permute)(-start)?\(")
WHILE_RE = re.compile(r"while\(.*body=%?([\w.\-]+)")
CONST_RE = re.compile(r"s32\[\]\s+constant\((\d+)\)")


def shape_bytes(lhs: str, largest_only: bool = False) -> int:
    # Bytes of the shapes in an instruction result type. largest_only:
    # async *-start ops have a TUPLE lhs holding operand AND result
    # buffers - summing double-counts the transfer; the result (largest)
    # buffer is the moved volume (code-review r5b finding #3).
    # (plain comments: this source lives inside the _CHILD string literal,
    # so a triple-quoted docstring here would terminate it)
    sizes = []
    for dt, dims in SHAPE_RE.findall(lhs):
        numel = 1
        if dims:
            for d in dims.split(","):
                numel *= int(d)
        sizes.append(numel * DTYPE_BYTES[dt])
    if not sizes:
        return 0
    return max(sizes) if largest_only else sum(sizes)


def analyze(compiled) -> dict:
    txt = compiled.as_text()
    # map computation name -> its instruction lines
    comps, cur = {}, None
    for line in txt.splitlines():
        s = line.strip()
        if line and not line[0].isspace():
            m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)\s*\(", line)
            if m and line.rstrip().endswith("{"):
                cur = m.group(1)
                comps[cur] = []
                continue
        if cur is not None and s:
            comps[cur].append(s)
    # trip count per while body: the constant in the paired condition
    # computation (fori_loop lowers to compare(iv, constant))
    body_trips = {}
    for name, lines in comps.items():
        for ln in lines:
            wm = WHILE_RE.search(ln)
            if not wm:
                continue
            body = wm.group(1)
            cm = re.search(r"condition=%?([\w.\-]+)", ln)
            trip = None
            if cm and cm.group(1) in comps:
                consts = [int(c) for l2 in comps[cm.group(1)]
                          for c in CONST_RE.findall(l2)]
                if consts:
                    trip = max(consts)
            body_trips[body] = trip if trip else 1
    per_kind = {}
    unresolved_loops = 0
    for name, lines in comps.items():
        mult = body_trips.get(name, 1)
        if name in body_trips and body_trips[name] == 1:
            unresolved_loops += 1
        for ln in lines:
            m = COLL_RE.search(ln)
            if not m:
                continue
            kind = m.group(2)
            b = shape_bytes(m.group(1), largest_only=m.group(3) is not None)
            ent = per_kind.setdefault(kind, {"count": 0, "bytes": 0})
            ent["count"] += mult
            ent["bytes"] += b * mult
    return {"per_kind": per_kind,
            "total_bytes": sum(e["bytes"] for e in per_kind.values()),
            "unresolved_loop_trip_counts": unresolved_loops}


rng = np.random.default_rng(0)
out = {"n_dev": n_dev, "workloads": {}}

# --- fit_large, all three factorizations -------------------------------
n, d = __N_FIT__, 4
x = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
y = jnp.sin(3.0 * x[:, 0]) + x[:, 1]
h = basis_matrix(x, linear_basis(d))
p = make_params(np.full(d, 0.8), nugget=1e-4, dtype=jnp.float32)
mesh_mr = make_mesh({"mr": n_dev}, devices=devices)
for facto in ("recursive", "panel", "block2d"):
    if facto == "block2d":
        if n_dev < 4:
            continue
        mesh = make_mesh({"mr": n_dev // 2, "mc": 2}, devices=devices)
    else:
        mesh = mesh_mr
    fit = jax.jit(lambda pp, xx, yy, hh, fa=facto, me=mesh: fit_large(
        pp, xx, yy, hh, me, block=__BLOCK__, factorization=fa))
    compiled = fit.lower(p, x, y, h).compile()
    out["workloads"]["fit_large_" + facto] = analyze(compiled)

# --- sharded HMC step ---------------------------------------------------
nh, dh, n_chains = 128, 4, 64
xh = jnp.asarray(rng.uniform(size=(nh, dh)), jnp.float32)
yh = jnp.sin(3.0 * xh[:, 0]) + xh[:, 1]
hh = basis_matrix(xh, linear_basis(dh))
ld = make_gp_logdensity(xh, yh, hh, MLEConfig(mode="mucm", nugget=1e-4))
cfg = HMCConfig(n_warmup=16, n_samples=16, n_leapfrog=4)
mesh_c = make_mesh({"chains": n_dev}, devices=devices)
z0 = jax.device_put(jnp.zeros((n_chains, dh), jnp.float32),
                    NamedSharding(mesh_c, P("chains")))
run = jax.jit(jax.shard_map(
    lambda k, z: hmc_sample(k, ld, z, cfg, axis_name="chains"),
    mesh=mesh_c, in_specs=(P(), P("chains")),
    out_specs=(P("chains"), P()), check_vma=False))
compiled = run.lower(jax.random.key(0), z0).compile()
out["workloads"]["hmc_sharded"] = analyze(compiled)

print(json.dumps(out))
"""


def run_one(n_dev: int, timeout_s: float = 1200.0) -> dict | None:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_dev}")
    child = (_CHILD.replace("__N_FIT__", str(N_FIT))
             .replace("__BLOCK__", str(BLOCK)))
    try:
        r = subprocess.run([sys.executable, "-c", child, str(n_dev)],
                           env=env, capture_output=True, text=True,
                           timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    return None


def model_efficiency(res_by_n: dict) -> dict:
    """Predicted eff(N) per workload/chip from HLO bytes + compute model."""
    out = {}
    flops_total = N_FIT ** 3 / 3.0        # the Cholesky dominates fit_large
    # serial fraction of the recursive scheme: the leaf is factorized
    # REPLICATED on every device (ops/distributed_cholesky.py _rec_chol);
    # at this proxy size leaf = n/2 -> leaf^3/n^3 = 1/8 of the FLOPs are
    # serial, which by Amdahl alone caps eff(8) at ~0.47 — the measured
    # 0.29-0.33 corrected proxy numbers are therefore dominated by this
    # small-problem artifact, not by collective volume. At production
    # n >= 16384 the leaf is 2048 -> serial fraction (2048/16384)^3 ~ 0.2%.
    leaf = max(min(2048, N_FIT // 2), BLOCK)
    serial_flops = {"fit_large_recursive": leaf ** 3 / 3.0,
                    "fit_large_panel": (N_FIT // BLOCK) * BLOCK ** 3 / 3.0,
                    "fit_large_block2d": (N_FIT // BLOCK) * BLOCK ** 3 / 3.0,
                    "hmc_sharded": 0.0}
    for chip in ("v5e", "v5p"):
        rate = ACHIEVED_FP32[chip]
        bw = ICI_RING_BW[chip]
        chip_out = {}
        for nd_s, res in res_by_n.items():
            nd = int(nd_s)
            for wl, data in res["workloads"].items():
                ser = serial_flops.get(wl, 0.0)
                t1 = flops_total / rate if wl.startswith("fit_large") else None
                t_comm = data["total_bytes"] / bw
                if t1 is None:
                    # HMC: compute per device shrinks 1/N; collectives are
                    # the parsed bytes (tiny scalar pmeans)
                    eff = 1.0 if data["total_bytes"] < 1e6 else None
                else:
                    t_n = ser / rate + (flops_total - ser) / (nd * rate) + t_comm
                    eff = t1 / (nd * t_n)
                chip_out.setdefault(wl, {})[nd_s] = {
                    "collective_bytes": data["total_bytes"],
                    "comm_seconds_modeled": round(t_comm, 6),
                    "predicted_efficiency": round(eff, 3) if eff else None,
                }
        out[chip] = chip_out
    # ---- production-scale extrapolation (n = 16384) ---------------------
    # every distributed scheme here moves Theta(n^2) collective bytes per
    # device while compute grows n^3/P: scale the HLO-measured bytes by
    # (16384/N_FIT)^2 and re-evaluate. Two bounds per point: sequential
    # (comm after compute) and perfectly-overlapped (async collectives
    # hidden behind trailing GEMMs, the XLA latency-hiding best case).
    n_prod = 16384
    scale = (n_prod / N_FIT) ** 2
    flops_prod = n_prod ** 3 / 3.0
    leaf_prod = 2048
    extrap = {}
    for chip in ("v5e", "v5p"):
        rate = ACHIEVED_FP32[chip]
        bw = ICI_RING_BW[chip]
        t1 = flops_prod / rate
        chip_e = {}
        for nd_s, res in res_by_n.items():
            nd = int(nd_s)
            for wl, data in res["workloads"].items():
                if not wl.startswith("fit_large"):
                    continue
                ser = (leaf_prod ** 3 / 3.0 if wl.endswith("recursive")
                       else (n_prod // BLOCK) * BLOCK ** 3 / 3.0)
                t_comm = data["total_bytes"] * scale / bw
                t_cmp = ser / rate + (flops_prod - ser) / (nd * rate)
                eff_seq = t1 / (nd * (t_cmp + t_comm))
                eff_ovl = t1 / (nd * max(t_cmp, t_comm))
                # break-even n where per-device compute == comm (both
                # sides scale: flops n^3/(3 P rate), bytes c*n^2/bw)
                c_bytes = data["total_bytes"] * scale / n_prod ** 2
                n_even = 3.0 * nd * rate * c_bytes / bw
                chip_e.setdefault(wl, {})[nd_s] = {
                    "bytes_extrapolated": int(data["total_bytes"] * scale),
                    "eff_sequential": round(eff_seq, 3),
                    "eff_overlapped": round(eff_ovl, 3),
                    "break_even_n": int(n_even),
                }
        extrap[chip] = chip_e
    out["extrapolated_n16384"] = extrap

    out["model"] = {
        "n": N_FIT, "block": BLOCK,
        "achieved_fp32_flops": ACHIEVED_FP32,
        "ici_ring_bytes_per_s": ICI_RING_BW,
        "serial_flops_model": {k: round(v / 1e9, 3) for k, v in
                               {"fit_large_recursive":
                                max(min(2048, N_FIT // 2), BLOCK) ** 3 / 3.0,
                                "fit_large_panel":
                                (N_FIT // BLOCK) * BLOCK ** 3 / 3.0}.items()},
        "findings": [
            "hmc_sharded moves 328 collective bytes per run (17 scalar "
            "pmeans) — its poor virtual-proxy efficiency (0.33 corrected "
            "at 8 dev) is host oversubscription, not the program: "
            "predicted hardware efficiency ~1.0, consistent with the "
            ">=80% north star for config 4",
            "at the proxy size n=2048 ALL fit_large schemes are "
            "comm/serial-bound on the model — the proxy cannot "
            "demonstrate compute scaling at this shape, matching its "
            "0.29-0.47 corrected numbers (recursive leaf = n/2 "
            "replicated -> 1/8 of FLOPs serial -> Amdahl cap 0.47)",
            "at n=16384 the 1D row-sharded schemes remain ICI-bound "
            "(eff_overlapped ~0.1-0.3): each device receives ~4n^2 words "
            "of panels/row-slices per factorize+solve. The >=80% target "
            "at 16k therefore requires the comm-avoiding layout "
            "(block2d's 2D block-cyclic with ~n^2/sqrt(P) per-device "
            "volume) plus gather-free TRSM partial-sums — or larger "
            "per-device n (see break_even_n per scheme)",
        ],
    }
    return out


def main():
    results = {}
    for nd in DEVICE_COUNTS:
        res = run_one(nd)
        if res is not None:
            results[str(nd)] = res
            print(f"# n_dev={nd}: "
                  + json.dumps({k: v["total_bytes"] for k, v in
                                res["workloads"].items()}),
                  file=sys.stderr)
    analytic = {"per_device_count": results,
                "efficiency_model": model_efficiency(results)}
    path = os.path.join(REPO, "SCALING.json")
    try:
        with open(path) as f:
            scaling = json.load(f)
    except (OSError, json.JSONDecodeError):
        scaling = {}
    scaling["analytic"] = analytic
    with open(path, "w") as f:
        json.dump(scaling, f, indent=1)
    print(json.dumps(analytic))


if __name__ == "__main__":
    main()

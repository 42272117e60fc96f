"""Profile the bench p50 EKF-update chain on TPU: op census, leaf time,
span vs wall (the r05 re-attribution tool — docs/tpu-design.md 'EKF-update
speed of light').  Run on the axon TPU; needs the tensorflow wheel for
xplane parsing."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("OVT_JAX_CACHE", os.path.expanduser("~/.cache/ovt_tpu_cache"))
import jax, jax.numpy as jnp, numpy as np
import open_vins_tpu  # noqa
from open_vins_tpu.core import ekf
from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.models import manager
from open_vins_tpu.ops import lie
from open_vins_tpu.utils import profiling

cfg = FilterConfig(max_clones=11, max_slam=50, num_cams=1,
                   max_msckf_in_update=40, integration="analytical",
                   newton_iters=14)
D = cfg.state_dim
print("D =", D)
state = manager.initialize_from_gt(
    cfg, jnp.asarray([0.,0.,0.,1.]), jnp.zeros(3), jnp.zeros(3),
    jnp.zeros(3), jnp.zeros(3), 0.0,
    jnp.tile(jnp.asarray([0.,0.,0.,1.]), (1,1)), jnp.zeros((1,3)),
    jnp.tile(jnp.asarray([458.,458.,376.,240.,0,0,0,0]), (1,1)))
rng = np.random.default_rng(0)
K = 64
Hs = jnp.asarray(rng.normal(size=(K, D, D)) * 0.3, jnp.float32)
ress = jnp.asarray(rng.normal(size=(K, D)) * 0.01, jnp.float32)
r_diag = jnp.ones(D, jnp.float32)

def run_chain(update_fn, label):
    @jax.jit
    def chain(st, Hs, ress):
        def body(s, hr):
            H, res = hr
            return update_fn(s, H, res), s.p[0]
        return jax.lax.scan(body, st, (Hs, ress))
    out, _ = chain(state, Hs, ress)
    _ = np.asarray(out.p)
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        out, _ = chain(state, Hs, ress)
        _ = np.asarray(out.p)
        lat.append((time.perf_counter() - t0) / K)
    p50 = float(np.percentile(lat, 50)) * 1e6
    print(f"[{label}] p50 {p50:.1f} us/update")
    tdir = f"/tmp/chainprof_{label}"
    with profiling.trace(tdir):
        out, _ = chain(state, Hs, ress)
        _ = np.asarray(out.p)
    return p50, tdir

# A: current full update (math + boxplus)
p50_a, dir_a = run_chain(lambda s, H, res: ekf.ekf_update(s, cfg, H, res, r_diag), "full")
# B: math only (no boxplus) — isolates the state-retraction op count
def math_only(s, H, res):
    dx, cov = ekf.kalman_update_math(s.cov, H, res, r_diag)
    return s._replace(cov=cov, p=s.p + dx[3:6])
p50_b, dir_b = run_chain(math_only, "mathonly")
# C: math with fuse_downdate=False (jnp downdate instead of pallas)
def math_nopallas(s, H, res):
    dx, cov = ekf.kalman_update_math(s.cov, H, res, r_diag, fuse_downdate=False)
    return ekf.boxplus(s, cfg, dx)._replace(cov=cov)
p50_c, dir_c = run_chain(math_nopallas, "nopallas")

# op census from xplane
import glob
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2
for label, tdir in [("full", dir_a), ("mathonly", dir_b), ("nopallas", dir_c)]:
    hits = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True))
    xs = xplane_pb2.XSpace(); xs.ParseFromString(open(hits[-1], "rb").read())
    for plane in xs.planes:
        if "/device:" not in plane.name: continue
        for line in plane.lines:
            if line.name != "XLA Ops": continue
            tot = defaultdict(float); cnt = defaultdict(int); n_ev = 0
            t_min, t_max = float("inf"), 0.0
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                if name.startswith(("%while","%cond","%conditional","jit_","%call")): continue
                tot[name] += ev.duration_ps/1e12; cnt[name]+=1; n_ev += 1
                t_min=min(t_min,ev.offset_ps); t_max=max(t_max,ev.offset_ps+ev.duration_ps)
            leaf=sum(tot.values()); span=(t_max-t_min)/1e12
            print(f"[{label}] events {n_ev} ({n_ev/K:.0f}/update), leaf {leaf*1e6/K:.1f} us/update, span {span*1e6/K:.1f} us/update")
            for name,t in sorted(tot.items(), key=lambda kv:-kv[1])[:10]:
                print(f"   {t*1e6/K:7.2f} us {cnt[name]/K:5.1f}x  {name[:110]}")

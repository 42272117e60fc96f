"""Profile the staged (render-excluded) stereo KLT tracker on TPU and
rank its device ops (the r05 front-end breakdown tool)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("OVT_JAX_CACHE", os.path.expanduser("~/.cache/ovt_tpu_cache"))
import jax, jax.numpy as jnp, numpy as np
import open_vins_tpu  # noqa
from open_vins_tpu.frontend import klt as klt_mod
from open_vins_tpu.models import runner
from open_vins_tpu.ops import lie as lie_mod
from open_vins_tpu.sim import simulator, trajectories
from open_vins_tpu.utils import profiling

stereo_R = lie_mod.exp_so3(jnp.asarray([-1.2, 1.2, -1.2]))
stereo_calib = (
    jnp.tile(jnp.asarray([458.0, 458.0, 376.0, 240.0, 0,0,0,0]), (2,1)),
    jnp.tile(stereo_R, (2,1,1)),
    jnp.stack([jnp.asarray([0.0,-0.01,0.02]), jnp.asarray([0.11,-0.01,0.02])]))
rparams = simulator.SimParams(
    imu_rate=200.0, cam_rate=20.0, num_cams=2, num_pts=200,
    map_size=2048, duration=8.0, sigma_pix=0.0, start_offset=3.0,
    width=752, height=480, min_depth=4.0, max_depth=9.0)
gore = os.path.join(trajectories.REFERENCE_SIM_DIR, "udel_gore.txt")
traj = trajectories.load_trajectory_file(gore)
rsim = simulator.build(rparams, seed=0, traj=traj, calib=stereo_calib)
kparams = klt_mod.KltParams(num_features=200, num_pyr=4, grid_x=20, grid_y=15)
n_track = 120
rend = jax.jit(lambda s: runner.render_frames(s, rparams, n_track))
imgs = rend(rsim)
_ = np.asarray(imgs[0,0,0,0])
trk = jax.jit(lambda im, s: runner.run_tracker_staged(im, s, rparams, kparams))
ts_, counts = trk(imgs, rsim)
_ = np.asarray(counts)
lat = []
for _ in range(5):
    t0 = time.perf_counter()
    ts_, counts = trk(imgs, rsim)
    _ = np.asarray(counts)
    lat.append((time.perf_counter()-t0)/n_track)
print(f"tracker-only: {1e3*np.median(lat):.3f} ms/frame = {1/np.median(lat):.1f} fps, tracks {float(np.array(counts).mean()):.0f}")
tdir = "/tmp/kltprof"
with profiling.trace(tdir):
    ts_, counts = trk(imgs, rsim)
    _ = np.asarray(counts)
import glob
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2
hits = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True))
xs = xplane_pb2.XSpace(); xs.ParseFromString(open(hits[-1],"rb").read())
for plane in xs.planes:
    if "/device:" not in plane.name: continue
    for line in plane.lines:
        if line.name != "XLA Ops": continue
        tot = defaultdict(float); cnt = defaultdict(int)
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            if name.startswith(("%while","%cond","%conditional","jit_","%call")): continue
            tot[name] += ev.duration_ps/1e12; cnt[name]+=1
        leaf = sum(tot.values())
        print(f"leaf total {leaf*1e3/n_track:.2f} ms/frame ({len(tot)} distinct)")
        for name,t in sorted(tot.items(), key=lambda kv:-kv[1])[:25]:
            print(f"  {t*1e3/n_track:7.3f} ms {cnt[name]/n_track:5.1f}x  {name[:120]}")

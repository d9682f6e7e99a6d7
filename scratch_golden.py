import sys, time
import numpy as np
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import opencorr_tpu as oc
from opencorr_tpu.data import poi as poi_mod

REF = "/root/reference/examples/2d_dic/oht_cfrp_0.bmp"
TAR = "/root/reference/examples/2d_dic/oht_cfrp_4.bmp"
GOLD = "/root/reference/examples/2d_dic/oht_cfrp_4_fftcc_icgn1_r16.csv"

ref = oc.Image2D.load(REF)
tar = oc.Image2D.load(TAR)
print("image", ref.height, ref.width)

pois = oc.poi_grid_2d((30, 30), 100, 300, 2)
print("pois", pois.n)

t0 = time.time()
f = oc.FFTCC2D(16, 16)
f.set_images(ref, tar)
pois = f.compute(pois)
jax.block_until_ready(pois.p)
t1 = time.time()
print("fftcc time (incl compile)", t1 - t0)

icgn = oc.ICGN2D1(16, 16, 0.001, 10)
icgn.set_images(ref, tar)
icgn.prepare()
jax.block_until_ready(icgn._lut)
t2 = time.time()
print("prepare time", t2 - t1)
pois = icgn.compute(pois)
jax.block_until_ready(pois.p)
t3 = time.time()
print("icgn time (incl compile)", t3 - t2)

# second run for steady-state timing
pois2 = oc.poi_grid_2d((30, 30), 100, 300, 2)
t4 = time.time()
pois2 = f.compute(pois2)
jax.block_until_ready(pois2.p)
t5 = time.time()
pois2 = icgn.compute(pois2)
jax.block_until_ready(pois2.p)
t6 = time.time()
print(f"steady fftcc {t5-t4:.4f}s  icgn {t6-t5:.4f}s  -> {pois.n/(t6-t5):.0f} POI/s")

gold = np.genfromtxt(GOLD, delimiter=",", skip_header=1, dtype=np.float64)
print("gold shape", gold.shape)
gu, gv = gold[:, 2], gold[:, 3]
gzncc = gold[:, 6]
u = np.asarray(pois2.u, np.float64)
v = np.asarray(pois2.v, np.float64)
z = np.asarray(pois2.zncc, np.float64)
it = np.asarray(pois2.r[:, poi_mod.R_ITER])

ok = (gzncc > 0) & (z > 0)
print("valid gold", (gzncc > 0).sum(), "valid ours", (z > 0).sum(), "both", ok.sum())
du = np.abs(u - gu)[ok]; dv = np.abs(v - gv)[ok]
print(f"mean|du| {du.mean():.6f}  mean|dv| {dv.mean():.6f}  max|du| {du.max():.4f} max|dv| {dv.max():.4f}")
print(f"zncc diff mean {np.abs(z-gzncc)[ok].mean():.6f}")
bad = np.argsort(-(np.abs(u-gu)*ok))[:5]
for b in bad:
    print("worst", b, "xy", gold[b,0], gold[b,1], "u", u[b], gu[b], "v", v[b], gv[b], "z", z[b], gzncc[b], "it", it[b], "gold_it", gold[b,7])

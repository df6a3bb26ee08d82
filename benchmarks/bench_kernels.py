"""Kernel microbenchmark: Pallas paged attention vs the XLA gather path.

Realistic decode shapes (B=32, ctx=2048, int8 KV): GQA (Hkv=8, G=4, D=128)
and MLA (H=16, r=512, dr=64).  Sweeps pages_per_step to show why the kernel
chunks P pages per grid step.  Run from anywhere: python benchmarks/bench_kernels.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time, os, sys
from vllm_from_scratch_tpu.ops import attention as att
from vllm_from_scratch_tpu.ops import mla_attention as mla
from vllm_from_scratch_tpu.ops.pallas import paged_attention_pallas, mla_paged_attention_pallas

BS=16
ITERS = 100

def timeit(f, *a):
    r=f(*a); jax.block_until_ready(r)  # compile
    # The axon tunnel has ~10-20ms per-sync overhead; amortize it over a
    # long async run with a single trailing sync.
    t0=time.perf_counter()
    for _ in range(ITERS): r=f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/ITERS*1e3

Hkv,G,D,B,ctx_len = 8,4,128,32,2048
Hq=Hkv*G
nb = B*ctx_len//BS + 1
cache = att.init_kv_cache(nb, BS, Hkv, D, kv_quant="int8")
k=jax.random.normal(jax.random.PRNGKey(0),(nb*BS,Hkv,D)); v=jax.random.normal(jax.random.PRNGKey(1),(nb*BS,Hkv,D))
cache = att.write_kv_cache(cache,k,v,jnp.arange(nb*BS,dtype=jnp.int32))
N = ctx_len//BS
tables = jnp.asarray(np.arange(1,1+B*N).reshape(B,N)%(nb-1), jnp.int32)
ctx = jnp.full((B,),ctx_len,jnp.int32); ql=jnp.ones((B,),jnp.int32)
q = jax.random.normal(jax.random.PRNGKey(2),(B,1,Hq,D))
sm = D**-0.5
os.environ["VFS_PALLAS"]="0"
xla = jax.jit(lambda q,c: att.paged_attention(q,c,tables,ctx,ql,block_size=BS,sm_scale=sm))
t_xla = timeit(xla, q, cache)
print(f"GQA decode B={B} ctx={ctx_len}: XLA {t_xla:.3f} ms")
for P in (4, 8, 16, 32):
    pal = jax.jit(lambda q,c,P=P: paged_attention_pallas(q,c.k,c.v,c.k_scale,c.v_scale,tables,ctx,ql,block_size=BS,sm_scale=sm,pages_per_step=P,interpret=False))
    # correctness spot check
    o1 = pal(q,cache); o2 = xla(q,cache)
    err = float(jnp.max(jnp.abs(o1-o2)))
    t = timeit(pal, q, cache)
    print(f"  Pallas P={P}: {t:.3f} ms  speedup {t_xla/t:.2f}x  maxerr {err:.1e}")

H,dn,dr,r = 16,128,64,512
cm = mla.init_mla_cache(nb,BS,r,dr,kv_quant="int8")
c=jax.random.normal(jax.random.PRNGKey(3),(nb*BS,r)); kr=jax.random.normal(jax.random.PRNGKey(4),(nb*BS,dr))
cm = mla.write_mla_cache(cm,c,kr,jnp.arange(nb*BS,dtype=jnp.int32))
qn=jax.random.normal(jax.random.PRNGKey(5),(B,1,H,dn)); qr=jax.random.normal(jax.random.PRNGKey(6),(B,1,H,dr))
w_uk=jax.random.normal(jax.random.PRNGKey(7),(H,dn,r))*0.05; w_uv=jax.random.normal(jax.random.PRNGKey(8),(H,r,dn))*0.05
sm2=(dn+dr)**-0.5
xlam = jax.jit(lambda qn,qr,cm: mla.mla_paged_attention(qn,qr,cm,tables,ctx,ql,w_uk,w_uv,block_size=BS,sm_scale=sm2))
t_xlam = timeit(xlam, qn,qr,cm)
print(f"MLA decode B={B} ctx={ctx_len}: XLA {t_xlam:.3f} ms")
for P in (4, 8, 16, 32):
    def palm_f(qn,qr,cm,P=P):
        q_l=jnp.einsum("bthd,hdr->bthr",qn,w_uk)
        lat=mla_paged_attention_pallas(q_l,qr,cm.c,cm.kr,cm.c_scale,cm.kr_scale,tables,ctx,ql,block_size=BS,sm_scale=sm2,pages_per_step=P,interpret=False)
        return jnp.einsum("bthr,hrv->bthv",lat,w_uv)
    palm = jax.jit(palm_f)
    err = float(jnp.max(jnp.abs(palm(qn,qr,cm)-xlam(qn,qr,cm))))
    t = timeit(palm, qn,qr,cm)
    print(f"  Pallas P={P}: {t:.3f} ms  speedup {t_xlam/t:.2f}x  maxerr {err:.1e}")

# ------------------------------------------------------- large-page variants
print("\n-- large pages (TPU-native config) --")
for BS2 in (64, 128, 256):
    nb2 = B*ctx_len//BS2 + 1
    cache2 = att.init_kv_cache(nb2, BS2, Hkv, D, kv_quant="int8")
    k2=jax.random.normal(jax.random.PRNGKey(0),(nb2*BS2,Hkv,D)); v2=jax.random.normal(jax.random.PRNGKey(1),(nb2*BS2,Hkv,D))
    cache2 = att.write_kv_cache(cache2, k2, v2, jnp.arange(nb2*BS2,dtype=jnp.int32))
    N2 = ctx_len//BS2
    tables2 = jnp.asarray((np.arange(1,1+B*N2).reshape(B,N2))%(nb2-1), jnp.int32)
    xla2 = jax.jit(lambda q,c,t=tables2,BS2=BS2: att.paged_attention(q,c,t,ctx,ql,block_size=BS2,sm_scale=sm))
    t_x2 = timeit(xla2, q, cache2)
    for P in (1, 2):
        if P*BS2 > ctx_len: continue
        pal2 = jax.jit(lambda q,c,P=P,t=tables2,BS2=BS2: paged_attention_pallas(q,c.k,c.v,c.k_scale,c.v_scale,t,ctx,ql,block_size=BS2,sm_scale=sm,pages_per_step=P,interpret=False))
        err = float(jnp.max(jnp.abs(pal2(q,cache2)-xla2(q,cache2))))
        t_p2 = timeit(pal2, q, cache2)
        print(f"GQA bs={BS2} P={P}: XLA {t_x2:.3f} ms  Pallas {t_p2:.3f} ms  speedup {t_x2/t_p2:.2f}x  maxerr {err:.1e}")
    cm2 = mla.init_mla_cache(nb2,BS2,r,dr,kv_quant="int8")
    c2=jax.random.normal(jax.random.PRNGKey(3),(nb2*BS2,r)); kr2=jax.random.normal(jax.random.PRNGKey(4),(nb2*BS2,dr))
    cm2 = mla.write_mla_cache(cm2,c2,kr2,jnp.arange(nb2*BS2,dtype=jnp.int32))
    xlam2 = jax.jit(lambda qn,qr_,c_,t=tables2,BS2=BS2: mla.mla_paged_attention(qn,qr_,c_,t,ctx,ql,w_uk,w_uv,block_size=BS2,sm_scale=sm2))
    t_xm2 = timeit(xlam2, qn,qr,cm2)
    for P in (1, 2):
        if P*BS2 > ctx_len: continue
        def palm2_f(qn,qr_,c_,P=P,t=tables2,BS2=BS2):
            q_l=jnp.einsum("bthd,hdr->bthr",qn,w_uk)
            lat=mla_paged_attention_pallas(q_l,qr_,c_.c,c_.kr,c_.c_scale,c_.kr_scale,t,ctx,ql,block_size=BS2,sm_scale=sm2,pages_per_step=P,interpret=False)
            return jnp.einsum("bthr,hrv->bthv",lat,w_uv)
        palm2 = jax.jit(palm2_f)
        err = float(jnp.max(jnp.abs(palm2(qn,qr,cm2)-xlam2(qn,qr,cm2))))
        t_pm2 = timeit(palm2, qn,qr,cm2)
        print(f"MLA bs={BS2} P={P}: XLA {t_xm2:.3f} ms  Pallas {t_pm2:.3f} ms  speedup {t_xm2/t_pm2:.2f}x  maxerr {err:.1e}")

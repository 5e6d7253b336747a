"""Collapse fixed-point behavior across material types.

Measures, per material: iterations to certify (R), collapse wall at two
iteration caps, and the serial-walk wall.  This experiment motivated the
stall rule in ``pallas_kernels._run_collapse`` (changed-boundary count
must shrink geometrically after a grace period, else bail to the exact
serial fallback).  Measured on the bench chip, round 5, AFTER the rule:

  bench_raw  R=28  collapse(cap12) 10.5 ms  serial 7.4 ms
  pink       R>64  collapse(cap12) 10.2 ms  serial 7.3 ms
  pulse      R=14  collapse(cap12) 10.0 ms  serial 7.1 ms
  sustained  R=3   collapse(cap12)  2.5 ms  serial 7.2 ms

(before the rule, the three non-certifying rows measured ~13.7 ms: the
full 12-round budget burned before the fallback).  The chain's own
front-processed detector stats certify in 3 rounds (BENCH_DETAILS
``ballistics_standalone_3min``), so the fast path is the production one.
"""
import sys, time, json, functools
import numpy as np
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from python_audio_mastering_tpu import ChainConfig, MasteringParams
from python_audio_mastering_tpu.ops import iir, multiband as mbnd
from python_audio_mastering_tpu.ops import pallas_multiband as pmb
from python_audio_mastering_tpu.ops import pallas_kernels as pk

def _sync(out):
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[tuple(slice(0,1) for _ in leaf.shape)])

def slope(fn, *args, k1=10, k2=40):
    out = fn(*args); _sync(out)
    def total(k):
        t0=time.perf_counter()
        outs=[fn(*args) for _ in range(k)]
        jax.block_until_ready(outs); _sync(outs[-1])
        return time.perf_counter()-t0
    total(3)
    t1=min(total(k1), total(k1)); t2=min(total(k2), total(k2))
    return (t2-t1)/(k2-k1) if t2>t1 else t2/k2

fs=44100; sec=180.0
n=int(sec*fs)
rng=np.random.default_rng(0)
t=np.arange(n)/fs

def mk_bench():
    sig=(0.4*np.sin(2*np.pi*55*t)+0.2*np.sin(2*np.pi*880*t)
         +0.1*np.sin(2*np.pi*4200*t)+0.05*rng.standard_normal(n))
    env=0.4+0.6*(0.5+0.5*np.sin(2*np.pi*0.5*t))**2
    return np.stack([sig*env,np.roll(sig*env,29)],axis=1).astype(np.float32)

def mk_pink():
    w=rng.standard_normal(n+1)
    f=np.fft.rfft(w)
    f/= np.maximum(np.sqrt(np.arange(f.size)),1.0)
    p=np.fft.irfft(f)[:n]
    p=0.5*p/np.abs(p).max()
    return np.stack([p,np.roll(p,13)],axis=1).astype(np.float32)

def mk_pulse():
    beat=int(fs*0.5)
    envp=np.exp(-5.0*((np.arange(n)%beat)/beat))
    sig=envp*(np.sin(2*np.pi*60*t)+0.3*rng.standard_normal(n))
    sig=0.8*sig/np.abs(sig).max()
    return np.stack([sig,np.roll(sig,7)],axis=1).astype(np.float32)

def mk_sustained():
    # hot sustained program: slow AM around the thresholds, never silent
    env2=0.55+0.1*np.sin(2*np.pi*0.2*t)+0.05*np.sin(2*np.pi*3.1*t)
    sig=env2*(np.sin(2*np.pi*220*t)+0.5*np.sin(2*np.pi*3300*t))
    return np.stack([sig,np.roll(sig,11)],axis=1).astype(np.float32)

cfg=ChainConfig.tpu_default(sample_rate=fs)
hop=cfg.comp_hop; L=cfg.block_size
params=MasteringParams.from_settings({"saturation":20,"preset":"techno","width":1.3,"lufs":-14.0,"multiband":True})
th=(params.low_thresh,params.mid_thresh,params.high_thresh)
ra=(params.low_ratio,params.mid_ratio,params.high_ratio)
lp_sos,hp_sos=mbnd._crossover_sos(fs,250.0,4000.0)

@jax.jit
def stats_of(x):
    nb=x.shape[0]//L
    xr=x[:nb*L].T.reshape(2,nb,L)
    sl,sh=iir.sosfilt_states_multi_rows((lp_sos,hp_sos),xr,(None,None),return_state=False)[0]
    xb=pmb.band_energies(xr,sl,sh,lp_sos,hp_sos,hop=hop)
    T=xb.shape[1]
    look=mbnd.detector_lookpad(fs,hop)//hop
    stk,_=mbnd._fused_stats_from_ctrl(xb,T,fs,th,ra,hop,None,look,jnp.float32,band_major=True)
    return stk["max_att"]

ca=jnp.asarray([hop/max(a*fs/1000.0,1.0) for a,_ in mbnd.BAND_BALLISTICS_MS],jnp.float32)
cr=jnp.asarray([hop/max(r*fs/1000.0,1.0) for _,r in mbnd.BAND_BALLISTICS_MS],jnp.float32)
ca8=jnp.pad(ca,(0,5))[:,None]; cr8=jnp.pad(cr,(0,5))[:,None]

def pad_bt(m):
    b,tt=m.shape
    blk=128*128
    tp=-(-tt//blk)*blk
    mp=jnp.pad(m,((0,8-b),(0,tp-tt)))
    return mp

def iter_count(mp):
    """Replicate _run_collapse's loop, return iterations to certify."""
    bp,tt=mp.shape
    blk=pk._LANES; nb=tt//blk
    mt=pk._block_layout(mp)
    frozen=jnp.max(mp.reshape(bp,nb,blk),axis=2)==0.0
    seq=jnp.where(frozen,0,jnp.arange(1,nb+1,dtype=jnp.int32)[None,:])
    idx_ex=jnp.concatenate([jnp.zeros((bp,1),jnp.int32),
                            jax.lax.cummax(seq,axis=1)[:,:-1]],axis=1)
    att0=jnp.zeros((bp,1),jnp.float32)
    def incomes(s):
        g=jnp.take_along_axis(s,jnp.maximum(idx_ex-1,0),axis=1)
        return jnp.where(idx_ex==0,att0,g)
    def body(c):
        s,_,k=c
        s2=pk._replay_bnd(mt,ca8,cr8,incomes(s),False)
        return s2,jnp.any(s2!=s),k+1
    def cond(c):
        _,ch,k=c
        return jnp.logical_and(ch,k<64)
    s0=jnp.zeros((bp,nb),jnp.float32)
    _,ch,k=jax.lax.while_loop(cond,body,(s0,jnp.bool_(True),0))
    return k,ch

fit=jax.jit(iter_count)

# NOTE: stats here come from RAW signals fed straight into the multiband
# detector — the adversarial regime.  The chain feeds multiband its
# front-processed signal, whose stats certify in 3 rounds (the bench
# ballistics_standalone_3min config measures that path).
mats={"bench_raw":mk_bench(),"pink":mk_pink(),"pulse":mk_pulse(),"sustained":mk_sustained()}
res={}
for name,x in mats.items():
    m=stats_of(jnp.asarray(x))
    mp=pad_bt(m)
    k,ch=fit(mp)
    entry={"iters_to_certify": int(k), "certified": bool(~np.asarray(ch))}
    for cap in (4,12):
        f=jax.jit(functools.partial(pk._run_collapse,tile=128*128,interpret=False,iters=cap))
        _=f(mp,ca8,cr8,jnp.zeros((8,1),jnp.float32))
        entry[f"collapse_ms_cap{cap}"]=round(slope(lambda mm: f(mm,ca8,cr8,jnp.zeros((8,1),jnp.float32))[0],mp)*1000,3)
    fs_=jax.jit(lambda mm: pk.ballistics_pallas_rates_bt(mm,ca,cr,mode="serial")[0])
    entry["serial_ms"]=round(slope(lambda mm: fs_(mm),m)*1000,3)
    res[name]=entry
    print(name, json.dumps(entry))
print(json.dumps(res))

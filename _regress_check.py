import time, numpy as np
from automix_tpu.config import EngineConfig
from automix_tpu.models.tutorial import tutorial_set
from automix_tpu.sampler import AMSampler

def run(tag, **kw):
    cfg = EngineConfig(n_chains=32768, n_chains_stage1=1024, stage1_sweeps=2000,
                       sweep_chunk=1000, seed=0, trace_chain0=False,
                       n_trace_chains=1, **kw)
    am = AMSampler(tutorial_set(), cfg)
    t0=time.perf_counter(); am.estimate_conditional_probs(); t_ad=time.perf_counter()-t0
    L = am.proposal.lam.shape[1]
    print(f"{tag}: nmix={np.asarray(am.proposal.nmix).tolist()} trimmed_L={L} adapt={t_ad:.1f}s", flush=True)
    am.burn_samples(1000); am.rjmcmc_samples(1000, collect=False)
    t0=time.perf_counter(); am.rjmcmc_samples(10000, collect=False); dt=time.perf_counter()-t0
    print(f"{tag}: {32768*10000/dt:,.0f} sweeps/s ({dt:.2f}s)", flush=True)

run("r2-default")
run("r1-like(target=1024)", stage1_target_samples=1024)

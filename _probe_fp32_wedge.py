import time
import jax, jax.numpy as jnp
from dalle_mtf_tpu.ops.attention import _wedge_forward, _wedge_backward, _wedge_layout
print("layout fp32 S=2560:", _wedge_layout(2560, 4))
b,h,s,d = 2,8,2560,128
ks = jax.random.split(jax.random.PRNGKey(0), 4)
q,k,v,g = (jax.random.normal(kk,(b,h,s,d),jnp.float32)*0.3 for kk in ks)
def run(q,k,v,g):
    out,lse = _wedge_forward(q,k,v,window=None,interpret=False,with_lse=True)
    dq,dk,dv = _wedge_backward(q,k,v,out,lse,g,window=None,interpret=False)
    return out,dq,dk,dv
f = jax.jit(run)
t0=time.time(); r = f(q,k,v,g); print("first vals", float(r[0].mean()), float(r[1].mean()))
print("compile+run ok in %.1fs" % (time.time()-t0))

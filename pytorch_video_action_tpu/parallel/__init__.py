from .dp import DataParallel
from .mesh import batch_sharding, batch_seq_sharding, make_mesh, replicated
from .ring import attn_forward_sp, ring_attention, ulysses_attention

"""somatic_sniper_tpu — a TPU-native tumor/normal somatic SNV caller.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
genome/somatic-sniper: the MAQ consensus genotype-likelihood model and the
joint diploid-genotype somatic score evaluated as dense batched kernels
over pileup-column tensors, fed by a streaming host-side BAM reader, with
genome-region sharding across TPU device meshes.
"""

__version__ = "0.1.0"

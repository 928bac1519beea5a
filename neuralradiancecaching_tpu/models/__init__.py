"""Model families: the NRC radiance cache, the MNIST tiny-MLP sanity
workload, and the 2D image-fit workload (BASELINE configs 1-2)."""

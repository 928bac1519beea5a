"""File IO: HDR/EXR/PNG images, raw density volumes, MNIST, checkpoints.

The reference's L0 loaders (read_file.cpp, openexr_helper.cpp, stb_image,
mnist reader) re-implemented for the TPU pipeline. Headless EXR/PNG output
replaces the reference's swapchain presentation (SURVEY.md §5). A native C++
fast path (csrc/) can be swapped in via ctypes where available.
"""

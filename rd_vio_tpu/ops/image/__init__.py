"""Image-frontend kernels (f32): CLAHE, pyramid, GFTT detection, pyramidal LK.

Behavioral reference: /root/reference/src/rdvio_extra/src/opencv_image.cpp
(CLAHE + 3-level pyramid preprocess :156-161, GFTT detection :38-73,
forward+backward pyramidal LK :75-154). These are the per-frame hot kernels
(SURVEY.md §2 L5 "TPU equivalent").
"""

"""Deformation/animation: skeleton FK, keyframe curves, LBS skinning,
per-frame on-device LBVH rebuild (SURVEY.md §2.9)."""

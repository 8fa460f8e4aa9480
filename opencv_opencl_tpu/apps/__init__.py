"""CLI apps mirroring the reference programs 1:1 (SURVEY §2 / §7.6).

reference binary            app module
--------------------------  -----------------------------
singlecolor / single        histeq_image
m2 / single2                histeq_image --method comparison (see m2_bench)
clahe1frame                 clahe_image
1frameMeasure               parity_bench
CLAHECompare / clahevideo   clahe_video
OpenCVequalHist family,
OpenCLequalHist, improvement relay
webrtc/sender family        sender
"""

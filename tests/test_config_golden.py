"""Golden-value tests: config defaults pin the reference's operational
constants (SURVEY.md §6 table / BASELINE.md). A drifted default silently
changes reference-equivalent behavior, so each is asserted literally."""
from metricsfm_tpu.config import (BundleAdjustOptions, DatabaseOptions,
                                  DenseOptions, GraphOptions,
                                  SLAMGPSOptions, SfMOptions, street_preset,
                                  uav_preset, web_preset)


def test_database_defaults():
    d = DatabaseOptions()
    assert d.size_image == 2000 * 1500          # basic_structs.h:155
    assert (d.voc_branch, d.voc_level) == (10, 6)   # fbow k=10 L=6 (:203-205)
    assert d.num_image_voc == 500
    assert d.min_keypoints_for_words == 300     # database.cc:798


def test_graph_defaults():
    g = GraphOptions()
    assert g.knn == 50                          # basic_structs.h:218
    assert (g.min_candidates, g.max_candidates) == (200, 500)  # initial_matching_graph.cc:168
    assert g.word_seed_min_matches == 30
    assert (g.ratio_good, g.ratio_all) == (0.6, 0.85)  # fine_matching_graph.cc:42-43
    assert g.epipolar_px == 3.0
    assert g.stop_word_frac == 0.01             # similarity_graph.cc:109-116
    assert g.utm_zone == "17N"


def test_ba_defaults():
    b = BundleAdjustOptions()
    assert b.max_iterations == 100              # basic_structs.h:233
    assert b.huber_delta == 1.0                 # optimizer.cc:84
    assert b.normalize_scale == 100.0           # optimizer.cc:155-195
    assert (b.perturb_sigma_rot, b.perturb_sigma_t, b.perturb_sigma_pt) == \
        (0.1, 0.5, 0.5)                         # optimizer.cc:197-232


def test_sfm_defaults():
    s = SfMOptions()
    assert s.th_seedpair_structures == 20       # basic_structs.h:174
    assert s.th_step_full_bundle_adjustment == 5
    assert s.th_max_failure_localization == 5   # basic_structs.h:176
    assert s.min_2d3d_correspondences == 20
    assert s.max_new_points_per_step == 20000
    assert s.idx_max_per_image == 1_000_000     # basic_structs.h:169-171
    assert (s.th_angle_small, s.th_angle_large) == (3.0, 5.0)
    assert s.weight_multiview == 2.0            # sfm_incremental.cc:1012


def test_dense_defaults():
    d = DenseOptions()
    assert d.disp_size == 128                   # basic_structs.h:240
    assert (d.p1, d.p2) == (10, 120)            # dense_reconstruction.cc:154
    assert d.uniqueness == 0.96
    assert (d.census_h, d.census_w) == (9, 7)
    assert d.num_paths == 8
    assert (d.depth_scale, d.depth_clamp) == (20.0, 600.0)  # :243-263


def test_slam_defaults():
    s = SLAMGPSOptions()
    assert s.matching_window == 5                  # slam_gps.cc:314
    assert s.resize_ratio == 0.5
    assert s.gps_weight_z_scale == 0.2          # gps_error_pose_absolute.h:41
    assert s.use_gps_relative is False          # slam_gps.cc:718-720


def test_mode_presets():
    web = web_preset()
    assert not web.sfm.use_same_camera          # test_sfm.cc WEB
    assert web.sfm.th_mse_outliers == 1.0
    uav = uav_preset()
    assert uav.sfm.use_same_camera              # test_sfm.cc UAV
    assert uav.graph.matching_type == "all"
    street = street_preset()
    assert street.slam.matching_window == 5

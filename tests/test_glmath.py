"""Math-layer parity tests: GLM RH_ZO conventions, camera, frustum, CSM."""

import numpy as np
import pytest

from vk_renderer_tpu.utils import glmath as glm
from vk_renderer_tpu.scene.camera import Camera
from vk_renderer_tpu.graph import scenedata


class TestPerspective:
    def test_maps_near_far_to_0_1(self):
        p = glm.perspective_rh_zo(np.radians(60.0), 16 / 9, 0.1, 100.0)
        # point on -z axis at near plane
        near = p @ np.array([0, 0, -0.1, 1], dtype=np.float32)
        far = p @ np.array([0, 0, -100.0, 1], dtype=np.float32)
        assert near[2] / near[3] == pytest.approx(0.0, abs=1e-6)
        assert far[2] / far[3] == pytest.approx(1.0, rel=1e-5)

    def test_w_equals_minus_z(self):
        p = glm.perspective_rh_zo(np.radians(60.0), 1.0, 0.1, 100.0)
        v = p @ np.array([1.0, 2.0, -5.0, 1.0], dtype=np.float32)
        assert v[3] == pytest.approx(5.0)

    def test_known_values(self):
        # fov 60deg, aspect 1: m00 = m11 = 1/tan(30deg) = sqrt(3)
        p = glm.perspective_rh_zo(np.radians(60.0), 1.0, 0.1, 100.0)
        assert p[0, 0] == pytest.approx(np.sqrt(3), rel=1e-6)
        assert p[1, 1] == pytest.approx(np.sqrt(3), rel=1e-6)
        assert p[2, 2] == pytest.approx(100.0 / (0.1 - 100.0), rel=1e-6)
        assert p[2, 3] == pytest.approx(-(100.0 * 0.1) / (100.0 - 0.1), rel=1e-6)


class TestOrtho:
    def test_maps_box_to_ndc(self):
        m = glm.ortho_rh_zo(-100, 100, -100, 100, 0.1, 100.0)
        # RH: looking down -z; z=-near maps to 0, z=-far maps to 1
        v0 = m @ np.array([-100, -100, -0.1, 1], dtype=np.float32)
        v1 = m @ np.array([100, 100, -100.0, 1], dtype=np.float32)
        np.testing.assert_allclose(v0[:3], [-1, -1, 0], atol=1e-6)
        np.testing.assert_allclose(v1[:3], [1, 1, 1], atol=1e-5)
        assert v0[3] == 1.0


class TestLookAt:
    def test_eye_maps_to_origin(self):
        eye = glm.vec3(1.0, 2.0, 3.0)
        m = glm.look_at_rh(eye, glm.vec3(0, 0, 0), glm.vec3(0, 1, 0))
        out = m @ np.append(eye, 1.0)
        np.testing.assert_allclose(out[:3], 0.0, atol=1e-6)

    def test_center_on_negative_z(self):
        m = glm.look_at_rh(glm.vec3(0, 0, 5), glm.vec3(0, 0, 0), glm.vec3(0, 1, 0))
        out = m @ np.array([0, 0, 0, 1], dtype=np.float32)
        np.testing.assert_allclose(out[:3], [0, 0, -5], atol=1e-6)

    def test_up_preserved(self):
        m = glm.look_at_rh(glm.vec3(0, 0, 5), glm.vec3(0, 0, 0), glm.vec3(0, 1, 0))
        up = m @ np.array([0, 1, 5, 1], dtype=np.float32)
        np.testing.assert_allclose(up[:3], [0, 1, 0], atol=1e-6)


class TestCamera:
    def test_identity_at_origin(self):
        cam = Camera()
        np.testing.assert_allclose(cam.view_matrix(), np.eye(4), atol=1e-6)

    def test_view_inverts_position(self):
        cam = Camera(position=np.array([1, 2, 3], dtype=np.float32))
        v = cam.view_matrix()
        out = v @ np.array([1, 2, 3, 1], dtype=np.float32)
        np.testing.assert_allclose(out[:3], 0.0, atol=1e-5)

    def test_yaw_rotates_forward(self):
        cam = Camera()
        cam.yaw = np.pi / 2  # rotate camera to look along -x
        v = cam.view_matrix()
        # world point at -x should now be in front (camera -z)
        out = v @ np.array([-5, 0, 0, 1], dtype=np.float32)
        np.testing.assert_allclose(out[:3], [0, 0, -5], atol=1e-5)

    def test_update_moves_in_view_space(self):
        cam = Camera()
        cam.yaw = np.pi / 2
        cam.process_keys(w=True)
        cam.update(1.0)  # forward = world -x after yaw
        np.testing.assert_allclose(cam.position, [-5, 0, 0], atol=1e-5)

    def test_projection_y_flip(self):
        cam = Camera()
        p = cam.projection_matrix(16 / 9)
        assert p[1, 1] < 0  # Vulkan y-down flip applied


class TestFrustum:
    def test_inside_points_positive(self):
        cam = Camera()
        vp = cam.projection_matrix(1.0) @ cam.view_matrix()
        planes = glm.extract_frustum_planes(vp)
        # a point straight ahead inside the frustum
        pt = np.array([0, 0, -10.0], dtype=np.float32)
        d = planes[:, :3] @ pt + planes[:, 3]
        assert np.all(d > 0)

    def test_outside_point_fails_a_plane(self):
        cam = Camera()
        vp = cam.projection_matrix(1.0) @ cam.view_matrix()
        planes = glm.extract_frustum_planes(vp)
        pt = np.array([0, 0, 10.0], dtype=np.float32)  # behind the camera
        d = planes[:, :3] @ pt + planes[:, 3]
        assert np.any(d < 0)


class TestCSM:
    def test_split_scheme(self):
        # lambda=0.5 mix of log and uniform splits (vk_engine_run.cpp:546-552)
        s = scenedata.compute_split(0.1, 100.0, 4)
        assert s == pytest.approx(100.0, rel=1e-6)
        s1 = scenedata.compute_split(0.1, 100.0, 1)
        c_log = 0.1 * (1000.0 ** 0.25)
        c_uni = 0.1 + 99.9 * 0.25
        assert s1 == pytest.approx(0.5 * c_log + 0.5 * c_uni, rel=1e-6)

    def test_cascade_distances_increasing(self):
        cam = Camera()
        mats, dists = scenedata.compute_csm_data(glm.vec4(0.5, -1.0, -0.5, 0.0), cam, 16 / 9)
        assert mats.shape == (4, 4, 4)
        assert np.all(np.diff(dists) > 0)
        assert dists[-1] == pytest.approx(100.0, rel=1e-5)

    def test_light_matrix_contains_frustum(self):
        cam = Camera()
        aspect = 16 / 9
        sun = glm.vec4(0.5, -1.0, -0.5, 0.0)
        m = scenedata.get_light_matrix(sun, cam, aspect, 0.1, 10.0)
        proj = glm.perspective_rh_zo(np.radians(cam.fov), aspect, 0.1, 10.0)
        corners = scenedata.frustum_corners_world(proj, cam.view_matrix())
        clip = (m @ corners.T).T
        ndc = clip[:, :3] / clip[:, 3:4]
        assert np.all(ndc[:, :2] >= -1.0001) and np.all(ndc[:, :2] <= 1.0001)
        assert np.all(ndc[:, 2] >= -1e-4) and np.all(ndc[:, 2] <= 1.0001)


class TestSceneData:
    def test_flag_packing(self):
        cam = Camera()
        st = scenedata.RenderSettings(enable_shadows=True, shadow_mode=2)
        sd = scenedata.build_scene_data(cam, st, 16 / 9)
        assert sd["sunlight_color"][3] == 1.0
        assert sd["sunlight_direction"][3] == 2.0
        # shadowMode<3 -> lightViewproj[0] is the single ortho matrix
        single = scenedata.compute_light_matrix(st.sunlight_direction, cam)
        np.testing.assert_allclose(sd["light_viewproj"][0], single, atol=1e-6)

    def test_csm_mode_keeps_cascades(self):
        cam = Camera()
        st = scenedata.RenderSettings(enable_shadows=True, shadow_mode=3)
        sd = scenedata.build_scene_data(cam, st, 16 / 9)
        mats, _ = scenedata.compute_csm_data(st.sunlight_direction, cam, 16 / 9)
        np.testing.assert_allclose(sd["light_viewproj"], mats, atol=1e-6)

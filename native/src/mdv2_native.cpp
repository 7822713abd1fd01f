// Native host-side kernels for the MagicDrive-V2 TPU data pipeline.
//
// The input pipeline's CPU-bound hot spots are BEV rasterization (10 object
// channels + 7 aux channels at 400x400 per frame, 12 Hz clips; reference uses
// PIL ImageDraw per box, mmdet_plugin/datasets/pipelines/loading.py:458-500)
// and box-corner geometry. These C++ kernels replace the per-box Python/PIL
// loop with tight scanline fills and vectorized geometry, exposed to Python via
// ctypes (magicdrive_v2_tpu/native.py). The TPU compute path stays JAX/XLA;
// this is host-side runtime, per the framework's native/runtime split.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// Scanline-fill one polygon (xy pixel coords, n_pts vertices) into a uint8
// canvas of shape (h, w), writing `value`. Matches PIL ImageDraw.polygon
// semantics closely (integer pixel centers, inclusive edges).
static void fill_polygon_one(uint8_t* canvas, int h, int w,
                             const float* xy, int n_pts, uint8_t value) {
    if (n_pts < 3) return;
    float ymin = 1e30f, ymax = -1e30f;
    for (int i = 0; i < n_pts; ++i) {
        ymin = std::min(ymin, xy[2 * i + 1]);
        ymax = std::max(ymax, xy[2 * i + 1]);
    }
    int y0 = std::max(0, (int)std::ceil(ymin - 0.5f));
    int y1 = std::min(h - 1, (int)std::floor(ymax + 0.5f));
    std::vector<float> xs;
    xs.reserve(8);
    for (int y = y0; y <= y1; ++y) {
        float fy = (float)y;
        xs.clear();
        for (int i = 0; i < n_pts; ++i) {
            int j = (i + 1) % n_pts;
            float x0 = xy[2 * i], yy0 = xy[2 * i + 1];
            float x1 = xy[2 * j], yy1 = xy[2 * j + 1];
            if ((yy0 <= fy && yy1 > fy) || (yy1 <= fy && yy0 > fy)) {
                float t = (fy - yy0) / (yy1 - yy0);
                xs.push_back(x0 + t * (x1 - x0));
            } else if (yy0 == fy && yy1 == fy) {
                // horizontal edge on the scanline: paint the span directly
                int a = std::max(0, (int)std::ceil(std::min(x0, x1)));
                int b = std::min(w - 1, (int)std::floor(std::max(x0, x1)));
                for (int x = a; x <= b; ++x) canvas[y * w + x] = value;
            }
        }
        std::sort(xs.begin(), xs.end());
        for (size_t i = 0; i + 1 < xs.size(); i += 2) {
            int a = std::max(0, (int)std::ceil(xs[i] - 0.5f));
            int b = std::min(w - 1, (int)std::floor(xs[i + 1] + 0.5f));
            for (int x = a; x <= b; ++x) canvas[y * w + x] = value;
        }
    }
}

// Fill n polygons (each n_pts[i] vertices, packed xy) into one canvas.
void mdv2_fill_polygons(uint8_t* canvas, int h, int w, const float* xy,
                        const int32_t* n_pts, int n_polys, uint8_t value) {
    int off = 0;
    for (int p = 0; p < n_polys; ++p) {
        fill_polygon_one(canvas, h, w, xy + 2 * off, n_pts[p], value);
        off += n_pts[p];
    }
}

// boxes (N, box_dim>=7: x, y, z_bottom, dx, dy, dz, yaw) -> corners (N, 8, 3)
// in the mmdet3d order (x0y0z0, x0y0z1, x0y1z1, x0y1z0, x1y0z0, x1y0z1,
// x1y1z1, x1y1z0); rotation about +z (clockwise for +yaw, LiDAR convention).
void mdv2_boxes_to_corners(const float* boxes, int n, int box_dim,
                           float* corners /* n*8*3 */) {
    static const float norm[8][3] = {
        {0, 0, 0}, {0, 0, 1}, {0, 1, 1}, {0, 1, 0},
        {1, 0, 0}, {1, 0, 1}, {1, 1, 1}, {1, 1, 0}};
    for (int i = 0; i < n; ++i) {
        const float* b = boxes + i * box_dim;
        double cx = b[0], cy = b[1], cz = b[2];
        double dx = b[3], dy = b[4], dz = b[5], yaw = b[6];
        double c = std::cos(yaw), s = std::sin(yaw);
        for (int k = 0; k < 8; ++k) {
            double lx = (norm[k][0] - 0.5) * dx;
            double ly = (norm[k][1] - 0.5) * dy;
            double lz = norm[k][2] * dz;
            // (x, y) @ [[c,-s],[s,c]] row-vector convention
            double rx = lx * c + ly * s;
            double ry = -lx * s + ly * c;
            float* out = corners + (i * 8 + k) * 3;
            out[0] = (float)(rx + cx);
            out[1] = (float)(ry + cy);
            out[2] = (float)(lz + cz);
        }
    }
}

// Project N boxes' corners through a 4x4 transform (optionally pre-multiplied
// by a 4x4 aug matrix), normalizing by z when proj != 0 (keeping sign of z).
// Equivalent to datasets/geometry.trans_boxes_to_view.
void mdv2_project_corners(const float* corners /* n*8*3 */, int n,
                          const double* trans /* 4x4 row-major */,
                          int proj, float* out /* n*8*3 */) {
    for (int i = 0; i < n * 8; ++i) {
        const float* p = corners + i * 3;
        double v[4];
        for (int r = 0; r < 4; ++r)
            v[r] = trans[r * 4 + 0] * p[0] + trans[r * 4 + 1] * p[1] +
                   trans[r * 4 + 2] * p[2] + trans[r * 4 + 3];
        if (proj) {
            double z = std::min(std::max(v[2], 1e-5), 1e5);
            out[i * 3 + 0] = (float)(v[0] / z);
            out[i * 3 + 1] = (float)(v[1] / z);
            out[i * 3 + 2] = (float)(v[2] / std::fabs(v[2]));
        } else {
            out[i * 3 + 0] = (float)v[0];
            out[i * 3 + 1] = (float)v[1];
            out[i * 3 + 2] = (float)v[2];
        }
    }
}

// Fused aux-channel rasterization for one frame (reference
// loading.py:370-456): for each box, fill its BEV footprint and write
// visibility / center-offset / center-ohw / height channels.
// aux: (aux_ch, h, w) float32, already zeroed; channel layout fixed:
// [vis(1), center_off(2), ohw(4), height(1)] subset selected by flags.
void mdv2_raster_aux(float* aux, int h, int w, int use_vis, int use_off,
                     int use_ohw, int use_height,
                     const float* box_canvas /* n*4*2 bottom corners xy */,
                     const float* centers /* n*2 */,
                     const float* fronts /* n*2 */, const float* lefts /* n*2 */,
                     const float* vis /* n */, const float* heights /* n */,
                     int n_boxes) {
    std::vector<uint8_t> mask((size_t)h * w);
    for (int b = 0; b < n_boxes; ++b) {
        std::fill(mask.begin(), mask.end(), 0);
        fill_polygon_one(mask.data(), h, w, box_canvas + b * 8, 4, 1);
        double cx = centers[b * 2], cy = centers[b * 2 + 1];
        double fx = fronts[b * 2] - cx, fy = fronts[b * 2 + 1] - cy;
        double lx = lefts[b * 2] - cx, ly = lefts[b * 2 + 1] - cy;
        double fn = std::sqrt(fx * fx + fy * fy);
        double hh = fn, ww = std::sqrt(lx * lx + ly * ly);
        double vx = fx / (fn + 1e-6), vy = fy / (fn + 1e-6);
        for (int y = 0; y < h; ++y) {
            for (int x = 0; x < w; ++x) {
                if (!mask[(size_t)y * w + x]) continue;
                size_t px = (size_t)y * w + x;
                int ch = 0;
                size_t plane = (size_t)h * w;
                if (use_vis) { aux[ch * plane + px] = vis ? vis[b] : 1.0f; ch += 1; }
                if (use_off) {
                    aux[ch * plane + px] = (float)(x - cx);
                    aux[(ch + 1) * plane + px] = (float)(y - cy);
                    ch += 2;
                }
                if (use_ohw) {
                    aux[ch * plane + px] = (float)hh;
                    aux[(ch + 1) * plane + px] = (float)ww;
                    aux[(ch + 2) * plane + px] = (float)vx;
                    aux[(ch + 3) * plane + px] = (float)vy;
                    ch += 4;
                }
                if (use_height) aux[ch * plane + px] = heights[b];
            }
        }
    }
}

// Z-buffered triangle-mesh rasterizer with per-vertex color interpolation
// (screen-space barycentric, no perspective correction — matches pytorch3d's
// MeshRasterizer defaults for TexturesVertex as used by the reference
// pedestrian_processor.py:508-647). verts: (V, 3) screen-space x, y, z(depth,
// camera-space, >0 visible); faces: (F, 3) int32; colors: (V, 3) float32 or
// NULL (depth/mask only). Outputs: rgb (h, w, 3) float32 (unchanged where no
// coverage), depth (h, w) float32 (caller initialises to +inf), face_id (h, w)
// int32 (-1 where empty). Faces with any vertex at z <= z_near are skipped.
void mdv2_rasterize_mesh(const float* verts, int n_verts,
                         const int32_t* faces, int n_faces,
                         const float* colors, int h, int w,
                         float z_near,
                         float* rgb, float* depth, int32_t* face_id) {
    (void)n_verts;
    for (int f = 0; f < n_faces; ++f) {
        const int32_t* tri = faces + f * 3;
        const float* a = verts + tri[0] * 3;
        const float* b = verts + tri[1] * 3;
        const float* c = verts + tri[2] * 3;
        if (a[2] <= z_near || b[2] <= z_near || c[2] <= z_near) continue;
        float xmin = std::min({a[0], b[0], c[0]});
        float xmax = std::max({a[0], b[0], c[0]});
        float ymin = std::min({a[1], b[1], c[1]});
        float ymax = std::max({a[1], b[1], c[1]});
        int x0 = std::max(0, (int)std::floor(xmin));
        int x1 = std::min(w - 1, (int)std::ceil(xmax));
        int y0 = std::max(0, (int)std::floor(ymin));
        int y1 = std::min(h - 1, (int)std::ceil(ymax));
        if (x0 > x1 || y0 > y1) continue;
        double det = (double)(b[0] - a[0]) * (c[1] - a[1]) -
                     (double)(b[1] - a[1]) * (c[0] - a[0]);
        if (std::fabs(det) < 1e-12) continue;
        for (int y = y0; y <= y1; ++y) {
            for (int x = x0; x <= x1; ++x) {
                double px = x + 0.5, py = y + 0.5;
                double w1 = ((px - a[0]) * (c[1] - a[1]) -
                             (py - a[1]) * (c[0] - a[0])) / det;
                double w2 = ((b[0] - a[0]) * (py - a[1]) -
                             (b[1] - a[1]) * (px - a[0])) / det;
                double w0 = 1.0 - w1 - w2;
                if (w0 < 0 || w1 < 0 || w2 < 0) continue;
                float z = (float)(w0 * a[2] + w1 * b[2] + w2 * c[2]);
                size_t px_i = (size_t)y * w + x;
                if (z >= depth[px_i]) continue;
                depth[px_i] = z;
                face_id[px_i] = f;
                if (colors) {
                    const float* ca = colors + tri[0] * 3;
                    const float* cb = colors + tri[1] * 3;
                    const float* cc = colors + tri[2] * 3;
                    for (int ch = 0; ch < 3; ++ch)
                        rgb[px_i * 3 + ch] = (float)(w0 * ca[ch] + w1 * cb[ch] +
                                                     w2 * cc[ch]);
                }
            }
        }
    }
}

}  // extern "C"

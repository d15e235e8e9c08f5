// Native URDF -> flat kinematic-tree compiler.
//
// TPU-native counterpart of the role Bullet's C++ URDF importer plays for
// the reference (p.loadURDF, world_creation.py:161-274): robot descriptions
// are compiled ahead-of-jit into flat arrays (JSON spec consumed by
// physics/model.py).  Mirrors models/urdf.py (the Python reference
// implementation); tests assert both emit identical specs.
//
// Build: make -C assistive_gym_tpu/native    (produces liburdfc.so)
// Python binding: ctypes (models/urdf.py), no pybind11 dependency.
//
// The XML parser handles the URDF subset the assets use: elements,
// attributes, comments; no namespaces/CDATA/doctypes.

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <functional>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------- tiny XML DOM
struct Node {
  std::string tag;
  std::map<std::string, std::string> attrs;
  std::vector<std::unique_ptr<Node>> children;

  const Node* find(const std::string& t) const {
    for (auto& c : children)
      if (c->tag == t) return c.get();
    return nullptr;
  }
  std::string attr(const std::string& k, const std::string& dflt = "") const {
    auto it = attrs.find(k);
    return it == attrs.end() ? dflt : it->second;
  }
};

struct Parser {
  const char* p;
  const char* end;

  explicit Parser(const std::string& s) : p(s.data()), end(s.data() + s.size()) {}

  void skip_ws() { while (p < end && std::isspace((unsigned char)*p)) ++p; }

  bool consume(const char* s) {
    size_t n = std::strlen(s);
    if ((size_t)(end - p) >= n && std::strncmp(p, s, n) == 0) { p += n; return true; }
    return false;
  }

  void skip_misc() {
    for (;;) {
      skip_ws();
      if (consume("<?")) { while (p < end && !consume("?>")) ++p; }
      else if (consume("<!--")) { while (p < end && !consume("-->")) ++p; }
      else if (consume("<!")) { while (p < end && *p != '>') ++p; if (p < end) ++p; }
      else return;
    }
  }

  std::string name() {
    const char* s = p;
    while (p < end && (std::isalnum((unsigned char)*p) || *p == '_' || *p == '-' || *p == ':')) ++p;
    return std::string(s, p);
  }

  std::unique_ptr<Node> element() {
    skip_misc();
    if (p >= end || *p != '<') return nullptr;
    ++p;
    auto node = std::make_unique<Node>();
    node->tag = name();
    for (;;) {
      skip_ws();
      if (consume("/>")) return node;
      if (consume(">")) break;
      std::string key = name();
      skip_ws();
      if (!consume("=")) return node;  // malformed; be lenient
      skip_ws();
      char quote = *p ? *p : '"';
      ++p;
      const char* s = p;
      while (p < end && *p != quote) ++p;
      node->attrs[key] = std::string(s, p);
      if (p < end) ++p;
    }
    // children / text until matching close tag
    for (;;) {
      skip_misc();
      if (p >= end) break;
      if (consume("</")) { name(); skip_ws(); consume(">"); break; }
      if (*p == '<') {
        auto child = element();
        if (child) node->children.push_back(std::move(child));
      } else {
        while (p < end && *p != '<') ++p;  // skip text content
      }
    }
    return node;
  }
};

// ------------------------------------------------------------- math utils
void rpy_to_quat(const double rpy[3], double q[4]) {
  double cr = std::cos(rpy[0] / 2), sr = std::sin(rpy[0] / 2);
  double cp = std::cos(rpy[1] / 2), sp = std::sin(rpy[1] / 2);
  double cy = std::cos(rpy[2] / 2), sy = std::sin(rpy[2] / 2);
  q[0] = sr * cp * cy - cr * sp * sy;
  q[1] = cr * sp * cy + sr * cp * sy;
  q[2] = cr * cp * sy - sr * sp * cy;
  q[3] = cr * cp * cy + sr * sp * sy;
}

// Jacobi eigen-decomposition of a symmetric 3x3 (ascending eigenvalues).
void eig3(double A[3][3], double w[3], double V[3][3]) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) V[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::fabs(A[0][1]) + std::fabs(A[0][2]) + std::fabs(A[1][2]);
    if (off < 1e-15) break;
    for (int pp = 0; pp < 2; ++pp)
      for (int qq = pp + 1; qq < 3; ++qq) {
        if (std::fabs(A[pp][qq]) < 1e-18) continue;
        double theta = (A[qq][qq] - A[pp][pp]) / (2 * A[pp][qq]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1));
        double c = 1.0 / std::sqrt(t * t + 1), s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = A[k][pp], akq = A[k][qq];
          A[k][pp] = c * akp - s * akq;
          A[k][qq] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = A[pp][k], aqk = A[qq][k];
          A[pp][k] = c * apk - s * aqk;
          A[qq][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = V[k][pp], vkq = V[k][qq];
          V[k][pp] = c * vkp - s * vkq;
          V[k][qq] = s * vkp + c * vkq;
        }
      }
  }
  int idx[3] = {0, 1, 2};
  for (int i = 0; i < 2; ++i)
    for (int j = i + 1; j < 3; ++j)
      if (A[idx[j]][idx[j]] < A[idx[i]][idx[i]]) std::swap(idx[i], idx[j]);
  double Vs[3][3];
  for (int i = 0; i < 3; ++i) {
    w[i] = A[idx[i]][idx[i]];
    for (int k = 0; k < 3; ++k) Vs[k][i] = V[k][idx[i]];
  }
  std::memcpy(V, Vs, sizeof(Vs));
  // right-handed basis
  double det = V[0][0] * (V[1][1] * V[2][2] - V[1][2] * V[2][1]) -
               V[0][1] * (V[1][0] * V[2][2] - V[1][2] * V[2][0]) +
               V[0][2] * (V[1][0] * V[2][1] - V[1][1] * V[2][0]);
  if (det < 0)
    for (int k = 0; k < 3; ++k) V[k][0] = -V[k][0];
}

void mat_to_quat(const double R[3][3], double q[4]) {
  double t = R[0][0] + R[1][1] + R[2][2];
  if (t > 0) {
    double s = std::sqrt(t + 1.0) * 2;
    q[0] = (R[2][1] - R[1][2]) / s;
    q[1] = (R[0][2] - R[2][0]) / s;
    q[2] = (R[1][0] - R[0][1]) / s;
    q[3] = 0.25 * s;
    return;
  }
  int i = 0;
  if (R[1][1] > R[0][0]) i = 1;
  if (R[2][2] > R[i][i]) i = 2;
  int j = (i + 1) % 3, k = (i + 2) % 3;
  double s = std::sqrt(std::max(R[i][i] - R[j][j] - R[k][k] + 1.0, 1e-12)) * 2;
  q[i] = 0.25 * s;
  q[3] = (R[k][j] - R[j][k]) / s;
  q[j] = (R[j][i] + R[i][j]) / s;
  q[k] = (R[k][i] + R[i][k]) / s;
}

void parse_floats(const std::string& s, double* out, int n, double dflt = 0.0) {
  for (int i = 0; i < n; ++i) out[i] = dflt;
  std::istringstream ss(s);
  for (int i = 0; i < n && (ss >> out[i]); ++i) {}
}

// ------------------------------------------------------------- spec model
struct LinkSpec {
  std::string link_name, joint_name;
  int parent = -1, joint_type = 0;
  double origin_xyz[3] = {0, 0, 0}, origin_quat[4] = {0, 0, 0, 1};
  double axis[3] = {1, 0, 0};
  double lower = 0, upper = -1, damping = 0, friction = 0;
  double max_force = 0, max_velocity = 0;
  double mass = 0, com[3] = {0, 0, 0};
  double inertia_diag[3] = {0, 0, 0}, inertia_quat[4] = {0, 0, 0, 1};
};

void inertial_of(const Node* link, double& mass, double com[3],
                 double diag[3], double iq[4]) {
  mass = 0; com[0] = com[1] = com[2] = 0;
  diag[0] = diag[1] = diag[2] = 0;
  iq[0] = iq[1] = iq[2] = 0; iq[3] = 1;
  const Node* in = link->find("inertial");
  if (!in) return;
  if (const Node* m = in->find("mass")) mass = std::atof(m->attr("value", "0").c_str());
  double rpy[3] = {0, 0, 0};
  if (const Node* o = in->find("origin")) {
    parse_floats(o->attr("xyz"), com, 3);
    parse_floats(o->attr("rpy"), rpy, 3);
  }
  const Node* I = in->find("inertia");
  if (!I) { rpy_to_quat(rpy, iq); return; }
  double ixx = std::atof(I->attr("ixx", "0").c_str());
  double iyy = std::atof(I->attr("iyy", "0").c_str());
  double izz = std::atof(I->attr("izz", "0").c_str());
  double ixy = std::atof(I->attr("ixy", "0").c_str());
  double ixz = std::atof(I->attr("ixz", "0").c_str());
  double iyz = std::atof(I->attr("iyz", "0").c_str());
  double A[3][3] = {{ixx, ixy, ixz}, {ixy, iyy, iyz}, {ixz, iyz, izz}};
  double w[3], V[3][3];
  eig3(A, w, V);
  double qr[4];
  rpy_to_quat(rpy, qr);
  // R = R(rpy) * V
  double Rr[3][3];
  {
    double x = qr[0], y = qr[1], z = qr[2], ww = qr[3];
    double R0[3][3] = {
        {1 - 2 * (y * y + z * z), 2 * (x * y - ww * z), 2 * (x * z + ww * y)},
        {2 * (x * y + ww * z), 1 - 2 * (x * x + z * z), 2 * (y * z - ww * x)},
        {2 * (x * z - ww * y), 2 * (y * z + ww * x), 1 - 2 * (x * x + y * y)}};
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        Rr[i][j] = 0;
        for (int k = 0; k < 3; ++k) Rr[i][j] += R0[i][k] * V[k][j];
      }
  }
  for (int i = 0; i < 3; ++i) diag[i] = std::max(w[i], 0.0);
  mat_to_quat(Rr, iq);
}

std::string json_escape(const std::string& s) {
  std::string out;
  for (char c : s) {
    if (c == '"' || c == '\\') { out += '\\'; out += c; }
    else out += c;
  }
  return out;
}

}  // namespace

extern "C" int urdfc_compile(const char* urdf_path, const char* out_json_path) {
  std::ifstream f(urdf_path);
  if (!f) return 1;
  std::stringstream buf;
  buf << f.rdbuf();
  std::string content = buf.str();
  Parser parser(content);
  auto root = parser.element();
  if (!root || root->tag != "robot") return 2;

  std::map<std::string, const Node*> links;
  std::vector<const Node*> joints;
  for (auto& c : root->children) {
    if (c->tag == "link") links[c->attr("name")] = c.get();
    else if (c->tag == "joint") joints.push_back(c.get());
  }
  std::map<std::string, std::vector<const Node*>> children;
  std::map<std::string, bool> is_child;
  for (auto* j : joints) {
    const Node* pn = j->find("parent");
    const Node* cn = j->find("child");
    if (!pn || !cn) return 3;
    children[pn->attr("link")].push_back(j);
    is_child[cn->attr("link")] = true;
  }
  std::string root_link;
  for (auto& kv : links)
    if (!is_child.count(kv.first)) { root_link = kv.first; break; }
  if (root_link.empty()) return 4;

  std::vector<LinkSpec> out;
  std::map<std::string, int> index_of;
  index_of[root_link] = -1;

  // DFS matching PyBullet joint numbering (file order per parent)
  std::vector<std::string> stack_order;
  std::function<void(const std::string&)> visit = [&](const std::string& ln) {
    auto it = children.find(ln);
    if (it == children.end()) return;
    for (const Node* j : it->second) {
      std::string child = j->find("child")->attr("link");
      LinkSpec ls;
      ls.link_name = child;
      ls.joint_name = j->attr("name");
      ls.parent = index_of[ln];
      std::string type = j->attr("type");
      bool continuous = (type == "continuous");
      if (type == "revolute" || continuous) ls.joint_type = 1;
      else if (type == "prismatic") ls.joint_type = 2;
      else ls.joint_type = 0;
      double rpy[3] = {0, 0, 0};
      if (const Node* o = j->find("origin")) {
        parse_floats(o->attr("xyz"), ls.origin_xyz, 3);
        parse_floats(o->attr("rpy"), rpy, 3);
      }
      rpy_to_quat(rpy, ls.origin_quat);
      if (const Node* a = j->find("axis")) parse_floats(a->attr("xyz"), ls.axis, 3);
      double n = std::sqrt(ls.axis[0] * ls.axis[0] + ls.axis[1] * ls.axis[1] +
                           ls.axis[2] * ls.axis[2]);
      if (n > 0) { ls.axis[0] /= n; ls.axis[1] /= n; ls.axis[2] /= n; }
      else { ls.axis[0] = 1; ls.axis[1] = 0; ls.axis[2] = 0; }
      const Node* lim = j->find("limit");
      if (continuous || !lim) { ls.lower = 0; ls.upper = -1; }
      else {
        ls.lower = std::atof(lim->attr("lower", "0").c_str());
        ls.upper = std::atof(lim->attr("upper", "0").c_str());
        ls.max_force = std::atof(lim->attr("effort", "0").c_str());
        ls.max_velocity = std::atof(lim->attr("velocity", "0").c_str());
      }
      if (ls.joint_type == 0) { ls.lower = 0; ls.upper = -1; }
      if (const Node* d = j->find("dynamics")) {
        ls.damping = std::atof(d->attr("damping", "0").c_str());
        ls.friction = std::atof(d->attr("friction", "0").c_str());
      }
      inertial_of(links[child], ls.mass, ls.com, ls.inertia_diag, ls.inertia_quat);
      index_of[child] = (int)out.size();
      out.push_back(ls);
      visit(child);
    }
  };
  visit(root_link);

  // base inertial
  double bmass, bcom[3], bdiag[3], biq[4];
  inertial_of(links[root_link], bmass, bcom, bdiag, biq);

  FILE* fp = std::fopen(out_json_path, "w");
  if (!fp) return 5;
  auto arr3 = [&](const double* v) {
    std::fprintf(fp, "[%.17g, %.17g, %.17g]", v[0], v[1], v[2]);
  };
  auto arr4 = [&](const double* v) {
    std::fprintf(fp, "[%.17g, %.17g, %.17g, %.17g]", v[0], v[1], v[2], v[3]);
  };
  std::fprintf(fp, "{\"name\": \"%s\", \"root_link\": \"%s\", ",
               json_escape(root->attr("name", "robot")).c_str(),
               json_escape(root_link).c_str());
  std::fprintf(fp, "\"base_inertial\": {\"mass\": %.17g, \"com\": ", bmass);
  arr3(bcom);
  std::fprintf(fp, ", \"inertia_diag\": ");
  arr3(bdiag);
  std::fprintf(fp, ", \"inertia_quat\": ");
  arr4(biq);
  std::fprintf(fp, "}, ");

  auto str_list = [&](const char* key, auto getter) {
    std::fprintf(fp, "\"%s\": [", key);
    for (size_t i = 0; i < out.size(); ++i)
      std::fprintf(fp, "%s\"%s\"", i ? ", " : "", json_escape(getter(out[i])).c_str());
    std::fprintf(fp, "], ");
  };
  str_list("link_names", [](const LinkSpec& l) { return l.link_name; });
  str_list("joint_names", [](const LinkSpec& l) { return l.joint_name; });

  auto num_list = [&](const char* key, auto getter, bool last = false) {
    std::fprintf(fp, "\"%s\": [", key);
    for (size_t i = 0; i < out.size(); ++i)
      std::fprintf(fp, "%s%.17g", i ? ", " : "", (double)getter(out[i]));
    std::fprintf(fp, "]%s", last ? "}" : ", ");
  };
  auto vec_list = [&](const char* key, int n, auto getter) {
    std::fprintf(fp, "\"%s\": [", key);
    for (size_t i = 0; i < out.size(); ++i) {
      std::fprintf(fp, "%s", i ? ", " : "");
      if (n == 3) arr3(getter(out[i])); else arr4(getter(out[i]));
    }
    std::fprintf(fp, "], ");
  };
  num_list("parent", [](const LinkSpec& l) { return l.parent; });
  num_list("joint_type", [](const LinkSpec& l) { return l.joint_type; });
  vec_list("origin_xyz", 3, [](const LinkSpec& l) { return l.origin_xyz; });
  vec_list("origin_quat", 4, [](const LinkSpec& l) { return l.origin_quat; });
  vec_list("axis", 3, [](const LinkSpec& l) { return l.axis; });
  num_list("lower", [](const LinkSpec& l) { return l.lower; });
  num_list("upper", [](const LinkSpec& l) { return l.upper; });
  num_list("damping", [](const LinkSpec& l) { return l.damping; });
  num_list("friction", [](const LinkSpec& l) { return l.friction; });
  num_list("max_force", [](const LinkSpec& l) { return l.max_force; });
  num_list("max_velocity", [](const LinkSpec& l) { return l.max_velocity; });
  num_list("mass", [](const LinkSpec& l) { return l.mass; });
  vec_list("com", 3, [](const LinkSpec& l) { return l.com; });
  vec_list("inertia_diag", 3, [](const LinkSpec& l) { return l.inertia_diag; });
  std::fprintf(fp, "\"inertia_quat\": [");
  for (size_t i = 0; i < out.size(); ++i) {
    std::fprintf(fp, "%s", i ? ", " : "");
    arr4(out[i].inertia_quat);
  }
  std::fprintf(fp, "]}");
  std::fclose(fp);
  return 0;
}
